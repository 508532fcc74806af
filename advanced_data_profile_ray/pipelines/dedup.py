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

from ..functions.hashing import (
    MinHasher,
    band_hashes,
    char_shingles,
    hash_strings,
    simhash64,
)


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


class MinHashStage:
    """Actor-pool stage: text → (id, band, band_hash) rows + signature.

    The permutation table is built ONCE per actor in __init__ (stateful
    stage, SURVEY.md §2.3); per batch it loops docs with vectorized numpy
    inside (shingle set sizes vary per doc)."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int,
                 shingle_k: int):
        self.id_col = id_col
        self.text_col = text_col
        self.hasher = MinHasher(num_perm)
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_bh, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            sig = self.hasher.signature(char_shingles(t, self.shingle_k))
            bh = band_hashes(sig, self.bands, self.rows)
            out_id.extend([i] * self.bands)
            out_band.extend(range(self.bands))
            out_bh.extend(bh.view(np.int64).tolist())
            out_sig.extend([sig.tobytes()] * self.bands)
        return pa.table(
            {
                "id": pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.int64()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )


def minhash_candidate_pairs(ds, id_col: str, text_col: str,
                            num_perm: int = 128, bands: int = 32,
                            shingle_k: int = 5, concurrency=(1, 8)):
    """LSH bucket groupby → unique candidate pairs with estimated Jaccard
    from the signatures. Returns a pandas DataFrame (id_a, id_b,
    est_jaccard) with id_a < id_b."""
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_args=(id_col, text_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sig_a": [], "sig_b": []})
        g = g.drop_duplicates("id").sort_values("id")
        ids = g["id"].to_numpy()
        sigs_ = g["sig"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "sig_a": sigs_[ia], "sig_b": sigs_[ib]}
        )

    cand = (
        sigs.groupby(["band", "band_hash"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
    cand = cand.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
    est = [
        MinHasher.est_jaccard(
            np.frombuffer(a, dtype=np.uint64), np.frombuffer(b, dtype=np.uint64)
        )
        for a, b in zip(cand["sig_a"], cand["sig_b"])
    ]
    out = cand[["id_a", "id_b"]].copy()
    out["est_jaccard"] = est
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
    """Per-doc 64-bit SimHash over word-token hashes + 16-bit band chunks."""

    def __init__(self, id_col: str, text_col: str):
        import re

        self.id_col = id_col
        self.text_col = text_col
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out = {"id": [], "chunk": [], "chunk_val": [], "simhash": []}
        for i, t in zip(ids, texts):
            if t is None:
                continue
            toks = np.array(self.token_re.findall(t.lower()), dtype=object)
            h = simhash64(hash_strings(toks)) if toks.size else 0
            for c in range(4):
                out["id"].append(i)
                out["chunk"].append(c)
                out["chunk_val"].append((h >> (16 * c)) & 0xFFFF)
                out["simhash"].append(np.int64(np.uint64(h).view(np.int64)))
        return pa.table(
            {
                "id": pa.array(out["id"]),
                "chunk": pa.array(out["chunk"], pa.int32()),
                "chunk_val": pa.array(out["chunk_val"], pa.int64()),
                "simhash": pa.array(out["simhash"], pa.int64()),
            }
        )


def simhash_near_dups(ds, id_col: str, text_col: str, max_hamming: int = 3,
                      concurrency=(1, 8)) -> pd.DataFrame:
    """Docs within ``max_hamming`` bits of each other. By pigeonhole, any
    pair ≤3 bits apart shares at least one of the 4 16-bit chunks — the
    banding is exact, not probabilistic, for max_hamming ≤ 3."""
    from ..functions.hashing import hamming64

    sigs = ds.map_batches(
        SimHashStage,
        fn_constructor_args=(id_col, text_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "h_a": [], "h_b": []})
        g = g.drop_duplicates("id").sort_values("id")
        ids = g["id"].to_numpy()
        hs = g["simhash"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "h_a": hs[ia], "h_b": hs[ib]})

    cand = (
        sigs.groupby(["chunk", "chunk_val"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    cand = cand.drop_duplicates(["id_a", "id_b"])
    ham = [
        hamming64(int(np.uint64(np.int64(a))), int(np.uint64(np.int64(b))))
        for a, b in zip(cand["h_a"], cand["h_b"])
    ]
    out = cand[["id_a", "id_b"]].copy()
    out["hamming"] = ham
    out = out[out["hamming"] <= max_hamming]
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
