"""Dedup + ANN pipelines on corpora with KNOWN duplicate structure,
plus DuckDB cross-checks where SQL can express the op."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def make_corpus():
    """60 base docs; ids 1000+ are exact copies, 2000+ near-dup mutations."""
    rng = np.random.default_rng(5)
    words = ["data", "model", "stream", "batch", "merge", "shard", "table",
             "query", "filter", "vector", "column", "window", "group"]
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.choice(words, 40))
    for i in range(10):  # exact copies of docs 0..9
        docs[1000 + i] = docs[i]
    for i in range(10):  # near-dups of docs 20..29: change last two words
        base = docs[20 + i].split()
        base[-2:] = ["changed", "tail"]
        docs[2000 + i] = " ".join(base)
    ids = sorted(docs)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array([docs[i] for i in ids], pa.string())})


@pytest.fixture(scope="module")
def corpus():
    return make_corpus()


def test_exact_dedup(ray_session, corpus):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import exact_dedup_table

    out = exact_dedup_table(rd.from_arrow(corpus), "doc_id", "text").to_pandas()
    con = duckdb.connect()
    con.register("c", corpus)
    want = con.execute(
        "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM c GROUP BY text ORDER BY keep_id"
    ).fetch_df()
    pd.testing.assert_frame_equal(
        out.astype("int64"), want.astype("int64")
    )
    # the 10 exact copies dedup away
    assert out["n"].sum() == corpus.num_rows
    assert (out["n"] > 1).sum() == 10


def test_minhash_near_dups(ray_session, corpus):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import minhash_near_dups

    pairs = minhash_near_dups(
        rd.from_arrow(corpus), "doc_id", "text", threshold=0.6
    )
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    # every exact copy pair and every near-dup pair must be found
    for i in range(10):
        assert (i, 1000 + i) in found, f"exact pair {i} missed"
    for i in range(10):
        assert (20 + i, 2000 + i) in found, f"near pair {i} missed"
    # jaccard estimates are sane
    exact_pairs = pairs[(pairs["id_a"] < 60) & (pairs["id_b"] >= 1000) & (pairs["id_b"] < 2000)]
    assert (exact_pairs["jaccard"] == 1.0).all()
    near = pairs[pairs["id_b"] >= 2000]
    assert ((near["jaccard"] > 0.6) & (near["jaccard"] < 1.0)).all()
    assert (abs(pairs["est_jaccard"] - pairs["jaccard"]) < 0.25).all()


def test_minhash_spill_dir_identical_pairs(ray_session, corpus, tmp_path):
    """spill_dir parks the signature Dataset as partitioned parquet via
    the resumable sink (10^12-doc path) instead of .materialize();
    candidate pairs must be byte-identical to the in-memory path."""
    import os

    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import minhash_candidate_pairs

    mem = minhash_candidate_pairs(rd.from_arrow(corpus), "doc_id", "text")
    spill = str(tmp_path / "sigs")
    disk = minhash_candidate_pairs(rd.from_arrow(corpus), "doc_id", "text",
                                   spill_dir=spill)
    assert any(f.endswith(".parquet") for f in os.listdir(spill))
    pd.testing.assert_frame_equal(mem, disk)


def test_simhash_near_dups(ray_session, corpus):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import simhash_near_dups

    pairs = simhash_near_dups(rd.from_arrow(corpus), "doc_id", "text", max_hamming=3)
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in range(10):  # identical docs → hamming 0
        assert (i, 1000 + i) in found
    zero = pairs[pairs["hamming"] == 0]
    assert len(zero) >= 10


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import embedding_near_dups

    rng = np.random.default_rng(3)
    base = rng.normal(size=(200, 32)).astype(np.float32)
    # ids 1000+ are tiny perturbations of ids 0..19 → cosine ≈ 1
    near = base[:20] + rng.normal(scale=0.01, size=(20, 32)).astype(np.float32)
    vecs = np.concatenate([base, near])
    ids = list(range(200)) + [1000 + i for i in range(20)]
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    pairs = embedding_near_dups(rd.from_arrow(t), "vec_id", "embedding",
                                threshold=0.98)
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    hits = sum((i, 1000 + i) in found for i in range(20))
    assert hits >= 18  # LSH recall near 1 at cosine≈1


def test_brute_topk_matches_duckdb(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.ann import brute_topk

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    queries = np.stack(emb["embedding"].head(3).to_numpy())
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    got = brute_topk(ds, "vec_id", "embedding", queries, k=5)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW e AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')")
    want = con.execute(
        """SELECT q.vec_id AS qid, e.vec_id AS id,
                  list_cosine_similarity(e.embedding, q.embedding) AS cosine
           FROM e, (SELECT * FROM e WHERE vec_id < 3) q
           QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id) <= 5
           ORDER BY qid, cosine DESC, id"""
    ).fetch_df()
    assert list(got["id"]) == list(want["id"])
    np.testing.assert_allclose(got["cosine"], want["cosine"], atol=1e-5)


def test_ivf_recall(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.ann import brute_topk, ivf_topk

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    queries = np.stack(emb["embedding"].head(5).to_numpy())
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = brute_topk(ds, "vec_id", "embedding", queries, k=10)
    approx = ivf_topk(ds, "vec_id", "embedding", queries, k=10,
                      n_centroids=8, nprobe=3)
    recalls = []
    for qi in range(5):
        e = set(exact[exact["qid"] == qi]["id"])
        a = set(approx[approx["qid"] == qi]["id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_lsh_bucket_pairs_edge_stitching(ray_session):
    """Buckets that straddle sorted-block boundaries must still pair up:
    compare the distributed expansion against a naive single-process
    reference over many tiny blocks (every bucket forced to the edges)."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import lsh_bucket_pairs

    rng = np.random.default_rng(11)
    n = 2000
    keys = rng.integers(0, 150, n)          # ~13 ids per bucket on average
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"key": pa.array(keys, pa.int64()),
                  "id": pa.array(ids, pa.int64())})
    # 40 blocks of 50 rows: nearly every bucket crosses a block boundary
    ds = rd.from_arrow(t).repartition(40)
    got = lsh_bucket_pairs(ds, max_bucket=64)

    naive = []
    for k in np.unique(keys):
        members = np.sort(ids[keys == k])
        if 2 <= members.size <= 64:
            ia, ib = np.triu_indices(members.size, k=1)
            naive.extend(zip(members[ia], members[ib]))
    want = pd.DataFrame(sorted(set(naive)), columns=["id_a", "id_b"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64"))


def test_lsh_bucket_pairs_oversize_cap(ray_session):
    """A bucket above max_bucket is skipped even when it spans blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import lsh_bucket_pairs

    n_big, n_small = 300, 5
    t = pa.table({
        "key": pa.array([7] * n_big + [9] * n_small, pa.int64()),
        "id": pa.array(np.arange(n_big + n_small), pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(20)
    got = lsh_bucket_pairs(ds, max_bucket=64)
    # only the small bucket pairs survive: C(5,2) = 10
    assert len(got) == 10
    assert set(got["id_a"]).issubset(set(range(n_big, n_big + n_small)))


def test_lsh_prefix_gate_mechanics(ray_session):
    """Generation-time prefix gate: pairs below the prefix-match bar die
    inside the bucket blocks (interior runs) AND in the driver edge
    stitch, with the same ≥-bar rule; resolution rules per
    _resolve_prefix_bar."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        _resolve_prefix_bar, lsh_bucket_pairs_ds)

    # auto-resolution: no-op at/below bar == 1/bands, threshold-derived above
    assert _resolve_prefix_bar("auto", 0.5, 16) is None
    assert _resolve_prefix_bar("auto", 0.7, 16) == pytest.approx(0.25)
    assert _resolve_prefix_bar(0.05, 0.9, 16) is None   # explicit but no-op
    assert _resolve_prefix_bar(None, 0.9, 16) is None

    def pfx(vals):
        return np.asarray(list(vals), np.uint32).tobytes()

    same = pfx(range(16))
    disj = pfx(range(100, 116))
    four = pfx(list(range(4)) + list(range(200, 212)))    # 4/16 vs `same`
    three = pfx(list(range(3)) + list(range(300, 313)))   # 3/16 vs `same`
    # ONE block → first/last runs (keys 0, 4) go through the driver edge
    # stitch, middle runs (keys 1-3) expand interior to the block
    rows = [
        (0, 1, same), (0, 2, disj),    # edge run, frac 0      → dropped
        (1, 3, same), (1, 4, same),    # interior, frac 1      → kept
        (2, 5, same), (2, 6, disj),    # interior, frac 0      → dropped
        (3, 7, same), (3, 8, four),    # interior, frac 4/16   → kept (≥ bar)
        (4, 9, same), (4, 10, three),  # edge run, frac 3/16   → dropped
    ]
    t = pa.table({
        "key": pa.array([r[0] for r in rows], pa.int64()),
        "id": pa.array([r[1] for r in rows], pa.int64()),
        "pfx": pa.array([r[2] for r in rows], pa.binary(64)),
    })
    out = lsh_bucket_pairs_ds(rd.from_arrow(t), prefix_bar=0.25).to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == {(3, 4), (7, 8)}
    # and without the gate every bucket pairs up
    ungated = lsh_bucket_pairs_ds(
        rd.from_arrow(t.select(["key", "id"]))).to_pandas()
    assert len(ungated) == 5


def test_minhash_prefix_gate_nondefault_config(ray_session, corpus, tmp_path):
    """Stride math at 128 perms / 32 bands (r=4) and gate+spill_dir
    together (prefix built from the parquet-roundtripped signature
    column): output must equal the ungated in-memory run. The forced
    distributed route (driver_max_pairs=0) additionally exercises the
    est-gate's _lo32_fixed width threading at non-default perms."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import minhash_near_dups

    gated = minhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                              threshold=0.7, num_perm=128, bands=32,
                              spill_dir=str(tmp_path / "sigs"))
    plain = minhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                              threshold=0.7, num_perm=128, bands=32,
                              prefix_bar=None)
    pd.testing.assert_frame_equal(gated, plain)
    assert {(i, 1000 + i) for i in range(10)} <= set(
        zip(gated["id_a"], gated["id_b"]))
    dist = minhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                             threshold=0.7, num_perm=128, bands=32,
                             driver_max_pairs=0)
    pd.testing.assert_frame_equal(
        plain[["id_a", "id_b", "jaccard"]].reset_index(drop=True)
        .astype({"id_a": "int64", "id_b": "int64"}),
        dist.astype({"id_a": "int64", "id_b": "int64"}),
        check_exact=False, atol=1e-12)


def test_lo32_fixed_empty_and_width():
    """Empty signature blocks (real after skewed sorts) must not crash
    the est-gate's truncation and must emit the SAME fixed_size_binary
    width as populated blocks (schema consistency across blocks); a
    populated block whose width disagrees with num_perm raises."""
    from advanced_data_profile_ray.pipelines.dedup import (
        _lo32_fixed, _sig_matrix)

    empty = pa.chunked_array([pa.array([], pa.binary())])
    assert _sig_matrix(empty).shape == (0, 0)
    out = _lo32_fixed(empty, 64)
    assert out.type == pa.binary(256) and len(out) == 0
    sig = np.arange(64, dtype=np.uint64).tobytes()
    one = pa.chunked_array([pa.array([sig], pa.binary())])
    assert _lo32_fixed(one, 64).type == pa.binary(256)
    with pytest.raises(ValueError):
        _lo32_fixed(one, 32)


def test_minhash_prefix_gate_output_parity(ray_session, corpus):
    """The auto prefix gate must not change the near-dup output at the
    default threshold (false-drop ~5e-8 per true pair): gated vs
    ungated runs are frame-identical on the known-structure corpus."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import minhash_near_dups

    gated = minhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                              threshold=0.7)
    plain = minhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                              threshold=0.7, prefix_bar=None)
    pd.testing.assert_frame_equal(gated, plain)
    found = set(zip(gated["id_a"], gated["id_b"]))
    assert found >= {(i, 1000 + i) for i in range(10)}


def test_jaccard_near_dups_oracle(ray_session, corpus):
    """Exact rare-word Jaccard vs a DuckDB twin on the known corpus."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import jaccard_near_dups

    # the corpus has a 13-word vocabulary, so df <= 64 would prune every
    # word (80 docs); max_df=100 keeps them all and makes exact copies 1.0
    got = jaccard_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                            threshold=0.5, max_df=100)
    con = duckdb.connect()
    con.register("documents", corpus)
    want = con.execute("""
        WITH words AS (
          SELECT DISTINCT doc_id,
                 UNNEST(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS w
          FROM documents WHERE text IS NOT NULL),
        rare AS (SELECT w FROM words GROUP BY w HAVING COUNT(*) <= 100),
        rw AS (SELECT doc_id, w FROM words WHERE w IN (SELECT w FROM rare)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rw GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                  FROM rw a JOIN rw b ON a.w = b.w AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        ORDER BY id_a, id_b
    """).df()
    # every exact copy pair (i, 1000+i) must appear with jaccard 1.0
    # (the tiny 13-word vocab makes many unrelated docs word-set-equal
    # too, so presence — not exclusivity — is the invariant here)
    idx = {(a, b): j for a, b, j in zip(got["id_a"], got["id_b"], got["jaccard"])}
    for i in range(10):
        assert idx.get((i, 1000 + i)) == 1.0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"id_a": "int64", "id_b": "int64"}).reset_index(drop=True))


def test_incremental_dedup_two_waves_and_idempotent(ray_session, tmp_path):
    """Two-wave ingest equals one-shot keep-first dedup; re-ingesting an
    already-indexed wave is idempotent (0 new)."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        exact_dedup_table,
        incremental_exact_dedup,
    )

    texts = ["alpha", "beta", "gamma", "alpha", "delta", "beta",
             "epsilon", "alpha", "zeta", "gamma"]
    rows = [{"id": i, "text": t} for i, t in enumerate(texts)]
    ds_all = rd.from_items(rows)
    wave1 = rd.from_items(rows[:5])
    wave2 = rd.from_items(rows[5:])
    idx = str(tmp_path / "index")

    k1, s1 = incremental_exact_dedup(wave1, "id", "text", idx, "w1")
    k2, s2 = incremental_exact_dedup(wave2, "id", "text", idx, "w2")
    got = sorted(k1["keep_id"].to_pylist() + k2["keep_id"].to_pylist())
    want = exact_dedup_table(ds_all, "id", "text")["keep_id"].to_pylist()
    assert got == sorted(want)
    # wave-2 stats: epsilon + zeta are new; alpha/beta/gamma hit the index
    assert s2["n_new"] == 2
    assert s2["n_dup_vs_index"] == 3

    # idempotent re-ingest: everything already indexed
    k2b, s2b = incremental_exact_dedup(wave2, "id", "text", idx, "w2")
    assert k2b.num_rows == 0
    assert s2b["n_new"] == 0


def test_connected_components_empty_pairs():
    """No candidate pairs (the common case at clean scale) returns a
    typed empty frame instead of crashing on float empty indices."""
    import numpy as np

    from advanced_data_profile_ray.pipelines.dedup import connected_components

    out = connected_components(np.array([]), np.array([]))
    assert list(out.columns) == ["doc_id", "cluster_id"]
    assert len(out) == 0 and out["doc_id"].dtype == "int64"


def test_incremental_dedup_tag_reuse_unions_not_overwrites(ray_session,
                                                           tmp_path):
    """Re-using an ingest tag with DIFFERENT data must union into the
    index (an overwrite would un-index the earlier hashes)."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        incremental_exact_dedup,
    )

    idx = str(tmp_path / "index")
    w1a = rd.from_items([{"id": 0, "text": "alpha"}, {"id": 1, "text": "beta"}])
    w1b = rd.from_items([{"id": 2, "text": "gamma"}])
    incremental_exact_dedup(w1a, "id", "text", idx, "w1")
    incremental_exact_dedup(w1b, "id", "text", idx, "w1")  # tag re-use
    # both waves' contents must now be indexed: everything is a dup
    probe = rd.from_items([{"id": 9, "text": "alpha"},
                           {"id": 10, "text": "gamma"}])
    kept, stats = incremental_exact_dedup(probe, "id", "text", idx, "w2")
    assert kept.num_rows == 0
    assert stats["n_dup_vs_index"] == 2


def test_minhash_distributed_matches_driver(ray_session, corpus):
    """The co-partitioned pair⨝shingle verify (verify_jaccard_ds) must
    produce the exact same near-dup set as the driver broadcast-dict
    path — the round-3-verdict graduation of pair handling off the
    driver."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        minhash_near_dups, minhash_near_dups_ds)

    drv = minhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                            threshold=0.5, distributed=False)
    dist = (minhash_near_dups_ds(rd.from_arrow(corpus), "doc_id", "text",
                                 threshold=0.5)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        drv[["id_a", "id_b", "jaccard"]].astype(
            {"id_a": "int64", "id_b": "int64"}).reset_index(drop=True),
        dist.astype({"id_a": "int64", "id_b": "int64"}),
        check_exact=False, atol=1e-12)
    # exact copies are jaccard-1 pairs: the 10 copy pairs must be present
    ones = dist[dist["jaccard"] >= 0.999]
    assert {(a, b) for a, b in zip(ones["id_a"], ones["id_b"])} >= {
        (i, 1000 + i) for i in range(10)}


def test_simhash_distributed_matches_driver(ray_session, corpus):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        simhash_near_dups, simhash_near_dups_ds)

    drv = simhash_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                            max_hamming=3, distributed=False)
    dist = (simhash_near_dups_ds(rd.from_arrow(corpus), "doc_id", "text",
                                 max_hamming=3)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(drv.astype("int64"), dist.astype("int64"))


def test_verify_jaccard_ds_empty_pairs(ray_session, corpus):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import verify_jaccard_ds

    pairs = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                    "id_b": pa.array([], pa.int64())}))
    out = verify_jaccard_ds(rd.from_arrow(corpus), "doc_id", "text", pairs)
    # the Dataset carries the typed schema even when every block is empty
    assert out.schema().names == ["id_a", "id_b", "jaccard"]
    assert out.count() == 0


def test_label_propagation_matches_union_find(ray_session, corpus):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        connected_components, jaccard_near_dups, label_propagation_ds)

    pairs = jaccard_near_dups(rd.from_arrow(corpus), "doc_id", "text",
                              threshold=0.5, max_df=64)
    pds = rd.from_arrow(pa.table({
        "id_a": pa.array(pairs["id_a"].astype("int64")),
        "id_b": pa.array(pairs["id_b"].astype("int64"))}))
    lp = (label_propagation_ds(pds).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    uf = connected_components(pairs["id_a"].to_numpy(),
                              pairs["id_b"].to_numpy())
    pd.testing.assert_frame_equal(lp.astype("int64"), uf.astype("int64"))


def test_label_propagation_million_pairs(ray_session):
    """10⁶ synthetic pairs — the 'too big to union-find comfortably'
    scale the round-3 verdict asked the distributed path to carry.
    Structure: 4-node chains (diameter 3 → few propagation rounds) plus
    intra-chain shortcut edges, all deterministic."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        connected_components, label_propagation_ds)

    n_chains = 250_000
    base = np.arange(n_chains, dtype=np.int64) * 10
    # chain edges 0-1, 1-2, 2-3 per chain + one shortcut 0-3
    a = np.concatenate([base, base + 1, base + 2, base])
    b = np.concatenate([base + 1, base + 2, base + 3, base + 3])
    assert a.size == 1_000_000
    pds = rd.from_arrow(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    lp = (label_propagation_ds(pds).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(lp) == n_chains * 4
    # every node's cluster is its chain head
    want_cluster = (lp["doc_id"].to_numpy() // 10) * 10
    assert (lp["cluster_id"].to_numpy() == want_cluster).all()
    # spot-parity with driver union-find on a slice of chains
    sl = a < 10_000
    uf = connected_components(a[sl], b[sl])
    lp_sl = lp[lp["doc_id"] < 10_000].reset_index(drop=True)
    pd.testing.assert_frame_equal(lp_sl.astype("int64"), uf.astype("int64"))


def test_embedding_distributed_matches_driver(ray_session):
    """Join-based cosine verify (embedding_near_dups_ds) must reproduce
    the broadcast-matrix driver path exactly — completes the dedup-family
    graduation off the driver (minhash/simhash/embedding)."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        embedding_near_dups, embedding_near_dups_ds)

    rng = np.random.default_rng(3)
    base = rng.normal(size=(200, 32)).astype(np.float32)
    near = base[:20] + rng.normal(scale=0.01, size=(20, 32)).astype(np.float32)
    vecs = np.concatenate([base, near])
    ids = list(range(200)) + [1000 + i for i in range(20)]
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    drv = embedding_near_dups(rd.from_arrow(t), "vec_id", "embedding",
                              threshold=0.98)
    dist = (embedding_near_dups_ds(rd.from_arrow(t), "vec_id", "embedding",
                                   threshold=0.98)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True).astype({"id_a": "int64", "id_b": "int64"}),
        dist.astype({"id_a": "int64", "id_b": "int64"}),
        atol=1e-9, check_exact=False)
    found = set(zip(dist["id_a"], dist["id_b"]))
    assert sum((i, 1000 + i) in found for i in range(20)) >= 18


def test_label_propagation_hot_node_exact(ray_session):
    """A node whose degree exceeds the join's bounded-rows-per-key clip
    must still propagate (hot nodes go map-side against a label
    broadcast) — a silent join-skip would sever the component and report
    a false convergence."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        label_propagation_ds,
    )

    n_leaves = 40_000  # degree > the 32,768 hot threshold
    hub = np.int64(5)  # NOT the minimum id: the min label must flow
    leaves = np.arange(10, 10 + n_leaves, dtype=np.int64)
    a = np.concatenate([[1], np.full(n_leaves, hub)])
    b = np.concatenate([[hub], leaves])  # node 1 attaches to the hub
    pds = rd.from_arrow(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    lp = (label_propagation_ds(pds).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(lp) == n_leaves + 2
    assert (lp["cluster_id"] == 1).all()  # min id reaches every leaf


def test_near_dups_empty_and_degenerate_corpus(ray_session):
    """Empty corpora (and all-blank ones, which SimHash drops entirely)
    must flow through the Dataset pair exchange as typed empties — the
    sort-of-nothing path loses its schema inside Ray otherwise."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        minhash_near_dups, simhash_near_dups)

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = minhash_near_dups(rd.from_arrow(empty), "doc_id", "text")
    assert list(out.columns) == ["id_a", "id_b", "est_jaccard", "jaccard"]
    assert len(out) == 0

    blanks = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                       "text": pa.array(["", "   ", None])})
    out = simhash_near_dups(rd.from_arrow(blanks), "doc_id", "text")
    assert list(out.columns) == ["id_a", "id_b", "hamming"]
    assert len(out) == 0


def test_verify_jaccard_ds_no_restrict_branch(ray_session, corpus):
    """broadcast_max_ids=0 forces the shingle-EVERYTHING branch (the
    dup-heavy path where candidate ids are too many to broadcast): the
    inner joins must drop non-candidates and produce identical output
    to the restricted branch."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        _minhash_sig_and_pairs, verify_jaccard_ds)

    ds = rd.from_arrow(corpus)
    _, pairs_ds = _minhash_sig_and_pairs(ds, "doc_id", "text")
    restricted = (verify_jaccard_ds(ds, "doc_id", "text", pairs_ds,
                                    threshold=0.5)
                  .to_pandas().sort_values(["id_a", "id_b"])
                  .reset_index(drop=True))
    everything = (verify_jaccard_ds(ds, "doc_id", "text", pairs_ds,
                                    threshold=0.5, broadcast_max_ids=0)
                  .to_pandas().sort_values(["id_a", "id_b"])
                  .reset_index(drop=True))
    pd.testing.assert_frame_equal(restricted, everything)
    assert len(restricted) >= 10


def test_minhash_wrapper_distributed_route(ray_session, corpus):
    """driver_max_pairs=0 forces the pandas wrapper onto the distributed
    route; its (id_a, id_b, jaccard) rows must equal the driver route's
    after dropping the est diagnostic."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import minhash_near_dups

    ds = rd.from_arrow(corpus)
    drv = minhash_near_dups(ds, "doc_id", "text", threshold=0.5,
                            distributed=False)
    auto = minhash_near_dups(ds, "doc_id", "text", threshold=0.5,
                             driver_max_pairs=0)
    assert list(auto.columns) == ["id_a", "id_b", "jaccard"]
    pd.testing.assert_frame_equal(
        drv[["id_a", "id_b", "jaccard"]].reset_index(drop=True)
        .astype({"id_a": "int64", "id_b": "int64"}),
        auto.astype({"id_a": "int64", "id_b": "int64"}),
        check_exact=False, atol=1e-12)


def test_epoch_mix_replication_semantics(ray_session):
    """floor(w) copies always; fractional copy decided per-id hash;
    weights < 1 downsample; copy_idx enumerates replicas 0..k-1;
    deterministic across runs."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.mix import epoch_mix

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64()),
                  "lang": pa.array((["en", "zh", "fr", None] * 250))})
    ds = rd.from_arrow(t)
    w = {"en": 2.5, "zh": 0.25, "fr": 1.0}
    out = epoch_mix(ds, "lang", "doc_id", w).to_pandas()
    out2 = epoch_mix(ds, "lang", "doc_id", w).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True),
        out2.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True))

    g = out.groupby("lang", dropna=False)["doc_id"].count()
    assert 250 * 2 <= g["en"] <= 250 * 3          # 2.5x: 2 or 3 per doc
    assert 0 < g["zh"] < 250                      # 0.25x downsampling
    assert g["fr"] == 250                          # exact 1x
    assert g[np.nan] == 250                        # NULL group: default 1.0
    per_doc = out[out["lang"] == "en"].groupby("doc_id")["copy_idx"].agg(
        ["count", "min", "max"])
    assert ((per_doc["min"] == 0)
            & (per_doc["max"] == per_doc["count"] - 1)).all()


def test_label_propagation_deep_chain_flat_iterations(ray_session):
    """Round-5 persistent-edge-layout bar: on a deep chain (diameter 32,
    ~17 propagation rounds) the static edge list sorts once and every
    round exchanges only labels — the whole run must finish in seconds
    (the old design paid a full edge re-sort per round) and labels must
    equal union-find's. Per-iteration wall isn't observable from outside
    the function, so the guard is the total-wall bound."""
    import time

    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        connected_components, label_propagation_ds)

    n = 33  # chain 0-1-2-...-32: diameter 32, needs ~17+ rounds
    pairs = pa.table({"id_a": pa.array(range(n - 1), pa.int64()),
                      "id_b": pa.array(range(1, n), pa.int64())})
    t0 = time.time()
    lp = (label_propagation_ds(rd.from_arrow(pairs), max_iters=64)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    wall = time.time() - t0
    uf = connected_components(pairs["id_a"].to_numpy(),
                              pairs["id_b"].to_numpy())
    pd.testing.assert_frame_equal(lp.astype("int64"),
                                  uf.astype("int64").sort_values("doc_id")
                                  .reset_index(drop=True))
    assert (lp["cluster_id"] == 0).all()
    # ~17 label-only iterations on 33 nodes must be seconds, not minutes
    # (the old design re-sorted the edge list every round)
    assert wall < 120, wall


def test_label_propagation_hub_star_graph(ray_session):
    """Regression (round-5 review): a hub node duplicated across many
    pairs makes Ray's sort emit EMPTY (schema-less) blocks on the skewed
    key — _build_layout must skip them instead of crashing, and the star
    must label as one component."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        connected_components, label_propagation_ds)

    n = 2000
    pairs = pa.table({"id_a": pa.array([0] * n, pa.int64()),
                      "id_b": pa.array(range(1, n + 1), pa.int64())})
    # several input blocks so the sorted hub key spans block boundaries
    pds = rd.from_arrow(pairs).repartition(8)
    lp = (label_propagation_ds(pds).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    uf = connected_components(pairs["id_a"].to_numpy(),
                              pairs["id_b"].to_numpy())
    pd.testing.assert_frame_equal(
        lp.astype("int64"),
        uf.astype("int64").sort_values("doc_id").reset_index(drop=True))
    assert (lp["cluster_id"] == 0).all()


def test_lev_le1_mask_fuzz():
    """Vectorized lev<=1 verify vs a brute-force DP over random short
    strings (covers substitution, insert/delete, equal, gap>=2, empty)."""
    import random

    from advanced_data_profile_ray.pipelines.dedup import _lev_le1_mask

    def lev(u, v):
        d = list(range(len(v) + 1))
        for i in range(1, len(u) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(v) + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (u[i - 1] != v[j - 1]))
                prev = cur
        return d[len(v)]

    rng = random.Random(7)
    a = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
         for _ in range(3000)]
    b = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
         for _ in range(3000)]
    got = _lev_le1_mask(np.array(a, dtype=object), np.array(b, dtype=object))
    exp = np.array([lev(u, v) <= 1 for u, v in zip(a, b)])
    assert (got == exp).all()


def test_edit_distance_pairs_exact(ray_session):
    """edit_distance_pairs_ds vs the quadratic brute force on a corpus
    with planted substitution / insertion / deletion neighbors spread
    over several blocks (cross-block buckets exercised)."""
    import itertools

    import ray.data as rd

    from advanced_data_profile_ray.pipelines.dedup import (
        _lev_le1_mask, edit_distance_pairs_ds)

    names = (["node-%03d" % i for i in range(40)]
             + ["node-0%02d" % i for i in range(10)]     # deletion pairs
             + ["mode-%03d" % i for i in range(10)]      # substitution
             + ["node-%03dx" % i for i in range(10)]     # insertion
             + ["zz", "zzz", "zzzz", "a" * 30])
    ids = list(range(len(names)))
    ds = rd.from_pandas(pd.DataFrame({"id": ids, "name": names})).repartition(6)
    out = edit_distance_pairs_ds(ds, "id", "name").to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))

    def lev(u, v):
        d = list(range(len(v) + 1))
        for i in range(1, len(u) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(v) + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (u[i - 1] != v[j - 1]))
                prev = cur
        return d[len(v)]

    exp = {(i, j) for i, j in itertools.combinations(ids, 2)
           if lev(names[i], names[j]) <= 1}
    assert got == exp and len(exp) > 50
    # verified payload carries the right strings
    by_pair = {(r.id_a, r.id_b): (r.name_a, r.name_b)
               for r in out.itertuples()}
    for (i, j), (na, nb) in by_pair.items():
        assert (na, nb) == (names[i], names[j])


def test_quantized_topk_recall(ray_session):
    """int8-quantized top-10 must keep recall >= 0.9 vs the exact
    float64 brute force on real testdata embeddings."""
    import ray.data as rd

    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.ann import (brute_topk,
                                                         quantized_topk)

    sf = "/root/testdata/sf0.01"
    q = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    qm = np.stack([np.asarray(v)
                   for v in q.sort_by("vec_id")["embedding"]
                   .to_pylist()[:5]])
    ds = rd.read_parquet(f"{sf}/embeddings.parquet")
    exact = brute_topk(ds, "vec_id", "embedding", qm, k=10)
    quant = quantized_topk(ds, "vec_id", "embedding", qm, k=10)
    rec = []
    for qi in range(5):
        e = set(exact.loc[exact["qid"] == qi, "id"])
        g = set(quant.loc[quant["qid"] == qi, "id"])
        rec.append(len(e & g) / len(e))
    assert np.mean(rec) >= 0.9, rec
