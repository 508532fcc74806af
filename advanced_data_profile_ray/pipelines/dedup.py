"""Deduplication pipelines over a document Dataset: exact, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

The reference only does whole-row exact duplicate detection
(``df.duplicated()``, Profiler.py:541); these are the training-data-scale
extensions the engine adds (driver instruction). Shapes:

- exact:     content-hash per batch → sorted_groupby keep-first
             (hash-partition + per-group first).
- MinHash:   shingle→minhash per batch (stateful actor holds the permuta-
             tion table) → explode (band, band_hash, id) → group band
             buckets → candidate pairs → exact-Jaccard verify.
- SimHash:   64-bit signature per doc → band on 16-bit chunks → candidate
             pairs → Hamming verify.
- embedding: normalize → random-hyperplane LSH bucket (or brute blocks) →
             in-bucket cosine pairs ≥ threshold.

All candidate generation is groupby-based (scales with data); only final
candidate pair lists are materialized (assumed ≪ input).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import char_shingles, hash_strings


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(ds, id_col: str, text_col: str):
    """Keep-first exact dedup by content hash. Returns (kept_ids_ds,
    dup_group_table): kept = min(id) per distinct content."""
    from ..stages.fast_ops import sorted_groupby

    def _hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch[text_col].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "content_hash": pa.array(h.view(np.int64)),
                id_col: batch[id_col],
            }
        )

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        _hash, batch_format="pyarrow"
    )
    inner, edge = sorted_groupby(
        hashed, ["content_hash"],
        [(id_col, "min", "keep_id"), (None, "count_all", "n")],
    )
    kept = inner.select_columns(["keep_id", "n"])
    return kept, edge  # caller unions edge (tiny) with kept


def exact_dedup_table(ds, id_col: str, text_col: str) -> pa.Table:
    """Materialized (keep_id, n) over all content groups — for
    small/medium outputs and oracle checks."""
    kept, edge = exact_dedup(ds, id_col, text_col)
    rows = kept.take_all()
    parts = []
    if rows:
        parts.append(pa.Table.from_pylist(rows))
    if edge is not None and edge.num_rows:
        parts.append(edge.select(["keep_id", "n"]))
    if not parts:
        return pa.table({"keep_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    out = pa.concat_tables(parts)
    return out.sort_by("keep_id")


# ---------------------------------------------------------------------------
# MinHash + LSH


_MERSENNE_P = np.uint64((1 << 61) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def batch_minhash_signatures(texts: pa.Array, num_perm: int, shingle_k: int,
                             seed: int = 1) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures for a whole Arrow
    string array with ZERO per-doc Python: k-byte shingle window hashes
    come straight off the Arrow data buffers (functions.hashing.
    batch_window_hashes — shared with document fingerprinting), then one
    universal hash + np.minimum.reduceat per permutation gives per-doc
    minima. MinHash needs no per-doc shingle dedup (min over a multiset
    equals min over its set). Docs shorter than k contribute one
    whole-content hash; null/empty docs get the all-max sentinel (same
    contract as MinHasher.signature on no shingles).
    """
    from ..functions.hashing import batch_window_hashes

    n = len(texts)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE_P), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE_P), num_perm, dtype=np.uint64)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return sigs

    h, doc_idx, seg_starts = batch_window_hashes(texts, shingle_k)
    if h.size == 0:
        return sigs
    seg_lens = np.diff(np.append(seg_starts, h.size))
    nonempty = seg_lens > 0
    red_starts = seg_starts[nonempty].astype(np.int64)
    for i in range(num_perm):
        # wrapping multiply-add (mod 2^64) — a modulo-p universal family
        # costs ~2× in uint64 modulo ops and buys nothing for min-ranking
        v = a[i] * h + b[i]
        sigs[nonempty, i] = np.minimum.reduceat(v, red_starts)
    return sigs


class MinHashStage:
    """Stage: text batch → one row per doc: (id, sig, band hashes).

    Fully vectorized (batch_minhash_signatures); the signature is emitted
    ONCE per doc (not once per band) — band rows are exploded later as
    skinny (id, band, band_hash) without the 0.5 KB signature payload."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int,
                 shingle_k: int):
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        sigs = batch_minhash_signatures(batch[self.text_col], self.num_perm,
                                        self.shingle_k)
        # band hash = splitmix64 of the wrapped sum of the band's rows
        view = sigs.reshape(len(batch), self.bands, self.rows)
        bh = _splitmix64(view.sum(axis=2, dtype=np.uint64)).view(np.int64)
        return pa.table(
            {
                "id": ids,
                "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
                "band_hashes": pa.array(list(bh), pa.list_(pa.int64())),
            }
        )


def minhash_candidate_pairs(ds, id_col: str, text_col: str,
                            num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 5, concurrency=(1, 16),
                            max_bucket: int = 64):
    # 64 perms / 16 bands keeps r=4 (same LSH threshold curve as 128/32)
    # at half the signature compute; est_jaccard σ ≈ 0.06 at J=0.5 and the
    # exact-Jaccard verify pass decides final pairs anyway.
    """Distributed signatures → LSH band buckets → unique candidate pairs
    with estimated Jaccard. Returns a pandas DataFrame (id_a, id_b,
    est_jaccard) with id_a < id_b.

    The signature pass is distributed (vectorized per batch); bucket
    grouping + pair expansion run on the driver over skinny
    (doc, band_hash) arrays — fine up to ~10^7 docs. The 10^12-scale path
    swaps the driver grouping for a sorted_groupby exchange keyed by
    (band, band_hash); simhash_near_dups shares the same structure."""
    # task-pool stage: the "state" is a seeded permutation table that
    # costs microseconds to rebuild, so a plain function schedules at
    # full width with no actor-pool ramp-up
    import ray

    stage = MinHashStage(id_col, text_col, num_perm, bands, shingle_k)
    # repartition before the signature stage: its cost is
    # O(num_perm × total_bytes) and map task count is bounded by input
    # block count — a single-file corpus would otherwise run serially
    n_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    rows = (
        ds.select_columns([id_col, text_col])
        .repartition(n_blocks)
        .map_batches(stage.__call__, batch_format="pyarrow", batch_size=2048)
        .take_all()
    )
    if not rows:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
    ids = np.array([r["id"] for r in rows])
    sigs = np.stack([np.frombuffer(r["sig"], dtype=np.uint64) for r in rows])
    bh = np.array([r["band_hashes"] for r in rows], dtype=np.int64)  # (n, bands)

    # pair expansion per band: sort docs by band hash, find runs > 1
    pair_a, pair_b = [], []
    skipped_buckets = 0
    for b in range(bh.shape[1]):
        col = bh[:, b]
        order = np.argsort(col, kind="stable")
        sv = col[order]
        run_start = np.concatenate([[0], np.nonzero(np.diff(sv))[0] + 1, [sv.size]])
        for s, e in zip(run_start[:-1], run_start[1:]):
            if e - s > 1:
                if e - s > max_bucket:
                    # giant buckets are boilerplate/template collisions:
                    # pairs grow quadratically with bucket size while the
                    # true near-dups inside are still caught by their
                    # other bands (exact dups by exact_dedup). Standard
                    # LSH bucket-size cap; count is surfaced, not silent.
                    skipped_buckets += 1
                    continue
                bucket = order[s:e]
                ia, ib = np.triu_indices(bucket.size, k=1)
                pair_a.append(bucket[ia])
                pair_b.append(bucket[ib])
    if skipped_buckets:
        import logging

        logging.getLogger(__name__).info(
            "minhash LSH: skipped %d buckets larger than %d docs",
            skipped_buckets, max_bucket)
    if not pair_a:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
    pa_idx = np.concatenate(pair_a)
    pb_idx = np.concatenate(pair_b)
    # canonical orientation by id, dedupe across bands
    swap = ids[pa_idx] > ids[pb_idx]
    lo = np.where(swap, pb_idx, pa_idx)
    hi = np.where(swap, pa_idx, pb_idx)
    uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
    lo, hi = uniq[:, 0], uniq[:, 1]
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    est = (sigs[lo] == sigs[hi]).mean(axis=1)
    out = pd.DataFrame({"id_a": ids[lo], "id_b": ids[hi], "est_jaccard": est})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def verify_jaccard(ds, id_col: str, text_col: str, pairs: pd.DataFrame,
                   shingle_k: int = 5) -> pd.DataFrame:
    """Exact shingle-set Jaccard for candidate pairs: broadcast the
    candidate id set, collect only those docs' shingle sets, verify on the
    driver (candidates ≪ corpus)."""
    import ray

    if pairs.empty:
        return pairs.assign(jaccard=[])
    ids_needed = set(pairs["id_a"]) | set(pairs["id_b"])
    ref = ray.put(pa.array(sorted(ids_needed)))

    def _collect(batch: pa.Table) -> pa.Table:
        need = ray.get(ref)
        sub = batch.filter(pc.is_in(batch[id_col], value_set=need))
        return pa.table({"id": sub[id_col], "text": sub[text_col]})

    docs = ds.select_columns([id_col, text_col]).map_batches(
        _collect, batch_format="pyarrow"
    ).take_all()
    shingles = {r["id"]: char_shingles(r["text"] or "", shingle_k) for r in docs}
    jac = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = shingles.get(a), shingles.get(b)
        if sa is None or sb is None or (sa.size == 0 and sb.size == 0):
            jac.append(0.0)
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        jac.append(inter / union if union else 0.0)
    out = pairs.copy()
    out["jaccard"] = jac
    return out


def minhash_near_dups(ds, id_col: str, text_col: str, threshold: float = 0.7,
                      **kw) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates → exact verify →
    pairs with true Jaccard ≥ threshold."""
    cand = minhash_candidate_pairs(ds, id_col, text_col, **kw)
    verified = verify_jaccard(ds, id_col, text_col, cand,
                              shingle_k=kw.get("shingle_k", 5))
    if verified.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": [], "jaccard": []})
    return verified[verified["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """64-bit SimHash per doc + 16-bit band chunks, fully vectorized:
    arrow lowercase + whitespace tokenization, one polars hash over the
    flattened token array, ±1 bit votes summed per doc with
    np.add.reduceat — no per-doc Python."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.hll import hash64_arrow

        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keep = col.is_valid()
        ids = batch[self.id_col].filter(keep)
        texts = col.drop_null()
        n = len(texts)
        if n == 0:
            return pa.table({"id": pa.array([], batch[self.id_col].type),
                             "chunk": pa.array([], pa.int32()),
                             "chunk_val": pa.array([], pa.int64()),
                             "simhash": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        sims = np.zeros(n, dtype=np.uint64)
        if len(flat):
            th = hash64_arrow(flat).astype(np.uint64)
            # zero-weight empty tokens (split artifacts) so they don't vote
            w = (pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0).astype(np.int64)
            seg_starts = np.minimum(offsets[:-1], len(flat) - 1)
            tokcnt = np.add.reduceat(w, seg_starts)
            nonempty = np.diff(offsets) > 0
            # one reduceat per bit plane (bit = ones*2 > tokens, i.e.
            # majority vote; ties -> 0) — O(64·tokens) without the
            # (tokens × 64) vote matrix
            packed = np.zeros(n, dtype=np.uint64)
            for j in range(64):
                ones = np.add.reduceat(((th >> np.uint64(j)) & np.uint64(1)).astype(np.int64) * w,
                                       seg_starts)
                packed |= ((ones * 2 > tokcnt).astype(np.uint64) << np.uint64(j))
            sims[nonempty] = packed[nonempty]
        ids_arr = pa.concat_arrays(ids.chunks) if isinstance(ids, pa.ChunkedArray) else ids
        out_id = pa.concat_arrays([ids_arr] * 4)
        chunk = np.repeat(np.arange(4, dtype=np.int32), n)
        chunk_val = np.concatenate(
            [((sims >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
             for c in range(4)]
        )
        sim_i64 = np.tile(sims.view(np.int64), 4)
        return pa.table(
            {
                "id": out_id,
                "chunk": pa.array(chunk, pa.int32()),
                "chunk_val": pa.array(chunk_val, pa.int64()),
                "simhash": pa.array(sim_i64, pa.int64()),
            }
        )


def simhash_near_dups(ds, id_col: str, text_col: str, max_hamming: int = 3,
                      concurrency=(1, 8)) -> pd.DataFrame:
    """Docs within ``max_hamming`` bits of each other. By pigeonhole, any
    pair ≤3 bits apart shares at least one of the 4 16-bit chunks — the
    banding is exact, not probabilistic, for max_hamming ≤ 3."""
    stage = SimHashStage(id_col, text_col)  # stateless: task pool
    rows = ds.select_columns([id_col, text_col]).map_batches(
        stage.__call__,
        batch_format="pyarrow",
        batch_size=8192,
    ).take_all()
    if not rows:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    # skinny (id, chunk, chunk_val, simhash) rows; pair expansion on the
    # driver exactly like minhash (distributed map_groups over thousands
    # of tiny buckets pays ~50µs/row Python merge — this is 4 rows/doc)
    ids = np.array([r["id"] for r in rows])
    chunk = np.array([r["chunk"] for r in rows], dtype=np.int64)
    cval = np.array([r["chunk_val"] for r in rows], dtype=np.int64)
    sims = np.array([r["simhash"] for r in rows], dtype=np.int64)
    key = (chunk << np.int64(16)) | cval
    pair_a, pair_b = [], []
    order = np.argsort(key, kind="stable")
    sv = key[order]
    run_start = np.concatenate([[0], np.nonzero(np.diff(sv))[0] + 1, [sv.size]])
    for s, e in zip(run_start[:-1], run_start[1:]):
        if e - s > 1:
            bucket = order[s:e]
            ia, ib = np.triu_indices(bucket.size, k=1)
            pair_a.append(bucket[ia])
            pair_b.append(bucket[ib])
    if not pair_a:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    pa_i = np.concatenate(pair_a)
    pb_i = np.concatenate(pair_b)
    swap = ids[pa_i] > ids[pb_i]
    lo = np.where(swap, pb_i, pa_i)
    hi = np.where(swap, pa_i, pb_i)
    uniq_pairs = np.unique(np.stack([ids[lo], ids[hi]], axis=1), axis=0)
    # map ids back to one simhash per id
    first_idx = {i: j for j, i in reversed(list(enumerate(ids)))}
    ha = np.array([sims[first_idx[a]] for a in uniq_pairs[:, 0]], dtype=np.int64)
    hb = np.array([sims[first_idx[b]] for b in uniq_pairs[:, 1]], dtype=np.int64)
    x = ha.view(np.uint64) ^ hb.view(np.uint64)
    ham = np.zeros(x.size, dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    keep = (ham <= max_hamming) & (uniq_pairs[:, 0] != uniq_pairs[:, 1])
    out = pd.DataFrame({"id_a": uniq_pairs[keep, 0], "id_b": uniq_pairs[keep, 1],
                        "hamming": ham[keep]})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dups(ds, id_col: str, vec_col: str, threshold: float = 0.95,
                        n_planes: int = 12, seed: int = 7) -> pd.DataFrame:
    """Random-hyperplane LSH bucket → in-bucket cosine pairs ≥ threshold.
    The scale path for embedding near-dup (brute force is ann.brute_topk).
    High thresholds → tiny angles → high bucket-collision recall."""
    first = ds.take(1)
    if not first:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float32)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df[vec_col].to_numpy())
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        signs = (mat @ planes) > 0
        bucket = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        return pd.DataFrame(
            {"id": df[id_col], "bucket": bucket.view(np.int64),
             "vec": [v.astype(np.float32) for v in mat]}
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        mat = np.stack(g["vec"].to_numpy())
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia][keep], "id_b": ids[ib][keep],
             "cosine": sims[ia, ib][keep].astype(np.float64)}
        )

    out = (
        ds.map_batches(_bucket, batch_format="pandas", batch_size=8192)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return (
        out.drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
