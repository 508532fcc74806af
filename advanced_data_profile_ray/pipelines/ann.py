"""Approximate-nearest-neighbor search over an embedding column
(``list<float>``).

- ``brute_topk``: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix, per-batch partial top-k, driver merge. The
  baseline and the oracle-checkable path.
- ``ivf_topk``: IVF scale path — k-means centroids fit on a sample
  (driver, seeded), vectors assigned to inverted lists via map_batches;
  queries probe the ``nprobe`` nearest lists only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def brute_topk(ds, id_col: str, vec_col: str, queries: np.ndarray, k: int = 10,
               batch_size: int = 8192) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns (qid, id, cosine)
    with qid = row index into ``queries``, sorted by (qid, -cosine, id).

    Partial top-k per batch keeps the shuffle-free merge small:
    n_batches × Q × k rows reach the driver, never the full corpus."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        mat = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        sims = mat @ qm.T  # (n, Q)
        ids = df[id_col].to_numpy()
        kk = min(k, len(ids))
        out_q, out_i, out_s = [], [], []
        for qi in range(qm.shape[0]):
            part = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(ids[part].tolist())
            out_s.extend(sims[part, qi].tolist())
        return pd.DataFrame({"qid": out_q, "id": out_i, "cosine": out_s})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    out = (
        parts.sort_values(["qid", "cosine", "id"], ascending=[True, False, True])
        .groupby("qid", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["qid"] = out["qid"].astype("int64")
    out["id"] = out["id"].astype("int64")
    return out


def fit_centroids(ds, vec_col: str, n_centroids: int = 16, sample_n: int = 4096,
                  iters: int = 10, seed: int = 11) -> np.ndarray:
    """Mini k-means on a driver-side sample (seeded Lloyd iterations on
    normalized vectors — centroids ≪ rows, so this is a driver op)."""
    rows = ds.select_columns([vec_col]).take(sample_n)
    mat = _normalize(np.stack([np.asarray(r[vec_col]) for r in rows]).astype(np.float64))
    # Ray Data's take() returns blocks in nondeterministic arrival order;
    # canonicalize the sample (lexicographic row sort) so the seeded
    # k-means init — and therefore the IVF index — is run-reproducible
    # (SURVEY §4 determinism requirement)
    mat = mat[np.lexsort(mat.T[::-1])]
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, id_col: str, vec_col: str, queries: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             batch_size: int = 8192) -> pd.DataFrame:
    """IVF-style ANN: per batch, score only vectors whose nearest centroid
    is among each query's ``nprobe`` probed lists. Same output schema as
    brute_topk; recall < 1 by design (scale path)."""
    import ray

    cents = fit_centroids(ds, vec_col, n_centroids)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    state = ray.put((q, cents, probes))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        qm, cm, pr = ray.get(state)
        mat = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        ids = df[id_col].to_numpy()
        assign = (mat @ cm.T).argmax(axis=1)  # inverted-list id per vector
        out_q, out_i, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = mat[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, sims.size)
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(sub_ids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pd.DataFrame({"qid": out_q, "id": out_i, "cosine": out_s})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({"qid": [], "id": [], "cosine": []})
    out = (
        parts.sort_values(["qid", "cosine", "id"], ascending=[True, False, True])
        .groupby("qid", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["qid"] = out["qid"].astype("int64")
    out["id"] = out["id"].astype("int64")
    return out


def cosine_range_search(ds, id_col: str, vec_col: str,
                        queries: np.ndarray, query_ids: np.ndarray,
                        threshold: float,
                        batch_size: int = 8192):
    """EXACT COSINE RANGE SEARCH: all (query, vector) pairs with
    cosine >= threshold — the radius-query sibling of ``brute_topk``
    (dedup gates, "everything this similar" retrieval). Broadcast query
    matrix via ``ray.put`` (read once per task, never re-shipped per
    batch); per-batch float64 matmul + threshold filter in map tasks;
    only matching pairs leave the batch, so the result is
    output-bounded, not corpus-bounded. Self-pairs (id == query id)
    are excluded. Returns a Dataset of (qid, vec_id)."""
    import pyarrow as pa_
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        mat = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        sims = mat @ qm.T  # (n, Q)
        ids = df[id_col].to_numpy().astype(np.int64)
        ri, qi = np.nonzero(sims >= threshold)
        keep = ids[ri] != qid_arr[qi]
        return pd.DataFrame({"qid": qid_arr[qi[keep]],
                             "vec_id": ids[ri[keep]]})

    return ds.select_columns([id_col, vec_col]).map_batches(
        _scan, batch_format="pandas", batch_size=batch_size)


def quantized_topk(ds, id_col: str, vec_col: str, queries: np.ndarray,
                   k: int = 10, batch_size: int = 8192) -> pd.DataFrame:
    """INT8-QUANTIZED cosine top-k — the memory-bound scale path of the
    vector family: vectors L2-normalize then quantize to symmetric int8
    (scale 127), cutting the resident footprint 4× vs float32 (at 10¹²
    rows the embedding column IS the working set); scores are exact
    int32 dot products of the quantized vectors, a monotone ~1/127²
    approximation of cosine. Same shuffle-free shape as ``brute_topk``:
    broadcast quantized query matrix, per-batch integer matmul, partial
    top-k per batch, driver merge of n_batches × Q × k stubs. Returns
    (qid, id, score) sorted by (qid, -score, id); recall vs the exact
    path is pinned by pytest, not an oracle (quantization is a model
    choice, not SQL)."""
    import ray

    def _quant(m: np.ndarray) -> np.ndarray:
        return np.clip(np.rint(_normalize(m) * 127.0), -127, 127).astype(
            np.int8)

    qq = _quant(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qq.astype(np.int32))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)  # (Q, d) int32
        mat = _quant(np.stack(df[vec_col].to_numpy()).astype(
            np.float64)).astype(np.int32)
        sims = mat @ qm.T  # exact int32 dots
        ids = df[id_col].to_numpy()
        kk = min(k, len(ids))
        out_q, out_i, out_s = [], [], []
        for qi in range(qm.shape[0]):
            part = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(ids[part].tolist())
            out_s.extend(sims[part, qi].tolist())
        return pd.DataFrame({"qid": out_q, "id": out_i, "score": out_s})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    out = (parts.sort_values(["qid", "score", "id"],
                             ascending=[True, False, True])
           .groupby("qid", as_index=False).head(k).reset_index(drop=True))
    out["qid"] = out["qid"].astype("int64")
    out["id"] = out["id"].astype("int64")
    out["score"] = out["score"].astype("int64")
    return out
