"""Referential-integrity checking via broadcast-hash semi/anti-join.

The reference has no joins (SURVEY.md §2.4); the north rule adds
referential integrity of fact columns (``conv_id``, ``tool``) against
dimension tables. Dimension sides are small, so this is never a shuffle
join: the key set is ``ray.put`` once on the driver and each actor in the
``map_batches`` pool materializes the hash set ONCE in ``__init__``
(SURVEY.md §2.3 ST4), then filters batches with ``pc.is_in`` (vectorized).

Relational twin for the oracle:
``SELECT f.* FROM fact f LEFT JOIN dim d ON f.k = d.k WHERE d.k IS NULL``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _build_value_set(valid_ref) -> pa.Array:
    import numpy as np

    import ray

    vals = (
        ray.get(valid_ref)
        if not isinstance(valid_ref, (set, list, tuple, pa.Array, np.ndarray))
        else valid_ref
    )
    if isinstance(vals, pa.Array):
        return vals  # pre-built deduped broadcast (no per-worker sort)
    if isinstance(vals, np.ndarray):
        return pa.array(vals)  # sorted numpy broadcast (broadcast_value_set)
    return pa.array(sorted(set(vals)))


def _typed_set(value_set: pa.Array, col) -> pa.Array:
    """is_in needs the value set typed like the column (an empty python
    list builds a null-typed array, and dim key ints may be narrower)."""
    if value_set.type != col.type:
        return value_set.cast(col.type)
    return value_set


class AntiJoinFilter:
    """Actor-pool stage: keep rows whose ``column`` value is non-null and
    NOT in the broadcast key set (the violation rows)."""

    def __init__(self, column: str, valid_ref):
        self.column = column
        self.value_set = _build_value_set(valid_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.column]
        if len(self.value_set) == 0:
            return batch.filter(col.is_valid())  # everything non-null is an orphan
        bad = pc.and_(
            col.is_valid(),
            pc.invert(pc.is_in(col, value_set=_typed_set(self.value_set, col))),
        )
        return batch.filter(bad)


class SemiJoinCounter:
    """Actor-pool stage emitting per-batch (matched, orphan, null) counts
    for a fact column vs the broadcast key set — the 'pass counts' side of
    the referential verdict; sums merge downstream."""

    def __init__(self, column: str, valid_ref):
        self.column = column
        self.value_set = _build_value_set(valid_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.column]
        valid = col.is_valid()
        if len(self.value_set):
            inset = pc.is_in(col, value_set=_typed_set(self.value_set, col))
            matched = pc.sum(pc.and_(valid, inset)).as_py() or 0
        else:
            matched = 0
        nulls = len(col) - (pc.sum(valid).as_py() or 0)
        orphan = len(col) - matched - nulls
        return pa.table(
            {
                "matched": pa.array([matched], pa.int64()),
                "orphan": pa.array([orphan], pa.int64()),
                "null": pa.array([nulls], pa.int64()),
            }
        )


# worker-process-global broadcast dim cache (keyed by ObjectRef hex):
# task-pool stages get actor-style once-per-worker init at full width.
# Bounded: each join invocation puts a fresh ObjectRef, so an unbounded
# dict would leak one dim copy per invocation per worker process.
_DIM_CACHE: dict = {}
_DIM_CACHE_MAX = 8


def _cached_dim(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _DIM_CACHE:
        import ray

        if len(_DIM_CACHE) >= _DIM_CACHE_MAX:
            _DIM_CACHE.pop(next(iter(_DIM_CACHE)))  # drop oldest insert
        _DIM_CACHE[key] = ray.get(ref) if hasattr(ref, "hex") else ref
    return _DIM_CACHE[key]


def broadcast_lookup_join(ds, fact_key: str, dim_table: pa.Table,
                          dim_key: str, value_cols: list):
    """Map-side enrichment (lookup) join: append ``value_cols`` from a
    SMALL dimension table to every fact row — broadcast once via
    ``ray.put``, resolved per batch with one sorted-key searchsorted
    (exact; no per-batch hash build, no shuffle). Unmatched/null fact
    keys get nulls, i.e. SQL ``fact LEFT JOIN dim`` with a unique dim key.

    The broadcast-small-side assumption is the scale contract: dims here
    are catalog-sized (nation/region/tool rosters). A big-big join needs
    a shuffle join, which nothing in this engine's surface requires."""
    import numpy as np

    import ray

    order = pc.sort_indices(dim_table[dim_key])
    sorted_dim = dim_table.take(order)
    keys_np = sorted_dim[dim_key].to_numpy(zero_copy_only=False)
    payload = {c: sorted_dim[c].combine_chunks() for c in value_cols}
    ref = ray.put((keys_np, payload))

    def _enrich(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keys, vals = _cached_dim(ref)
        fk = batch[fact_key].to_numpy(zero_copy_only=False)
        valid = ~pd.isna(fk)
        pos = np.zeros(len(batch), dtype=np.int64)
        hit = np.zeros(len(batch), dtype=bool)
        if valid.any() and keys.size:  # empty dim → every row misses (null)
            fv = fk[valid]
            p = np.searchsorted(keys, fv)
            p_c = np.minimum(p, keys.size - 1)
            pos[valid] = p_c
            hit[valid] = keys[p_c] == fv
        # null-masked indices: a miss takes a NULL payload (LEFT JOIN)
        take_idx = pa.array(pos, pa.int64(), mask=~hit)
        out = batch
        for c in value_cols:
            out = out.append_column(c, vals[c].take(take_idx))
        return out

    return ds.map_batches(_enrich, batch_format="pyarrow", batch_size=131072)
