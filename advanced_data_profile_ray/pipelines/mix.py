"""Training-data mixing: deterministic epoch-weighted source replication.

Data-mixing recipes assign each source/language a repetition weight
(e.g. en×2.5, code×0.8): every row emits floor(w) copies plus one more
with probability frac(w), decided by a per-row hash so reruns and
resumes reproduce the exact same mixture — no RNG state, no exchange,
composes map-side with any downstream shuffle/pack stage. The SQL-twin
arithmetic (same multiplier/threshold) makes the mixture exactly
oracle-checkable."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Knuth multiplicative constant (shared with the stratified sampler) and
# an independent XOR salt so mix decisions don't correlate with sampling
MIX_MULT = 2654435761
MIX_MOD = 1 << 32
MIX_SALT = 1482184749


def epoch_mix(ds, group_col: str, id_col: str, weights: dict,
              default_weight: float = 1.0):
    """Dataset of mixed rows: each input row appears ``floor(w)`` times
    plus one more iff ``((id XOR salt) · mult) mod 2³² < frac(w)·2³²``,
    where ``w = weights.get(group, default_weight)``. A ``copy_idx``
    column (0..k−1) distinguishes replicas so downstream dedup/packing
    can tell them apart. Weights < 1 downsample (floor 0 + fractional
    keep); NULL groups take the default weight.

    Id-domain contract: ids must be < 2³¹ so ``(id XOR salt) · mult``
    stays under 2⁶³ and the BIGINT oracle arithmetic matches bit-for-bit
    (the XOR can only widen the multiplicand up to the salt's 31 bits);
    hash a wider id domain down to 31 bits first. The fractional
    threshold is ``floor(frac(w)·2³²)`` on BOTH sides — the SQL twin
    must use FLOOR, not a bare CAST (which rounds)."""

    def _fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n:
            return batch.append_column("copy_idx", pa.array([], pa.int64()))
        # per-group weight via dictionary-encode: the (tiny) unique set
        # goes through the Python dict once; rows stay vectorized
        enc = batch[group_col].combine_chunks().dictionary_encode()
        lut = np.array(
            [weights.get(v, default_weight) for v in enc.dictionary.to_pylist()],
            dtype=np.float64,
        )
        if enc.indices.null_count:
            idx = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
            w = np.where(idx < 0, default_weight,
                         lut[np.maximum(idx, 0)] if len(lut) else default_weight)
        else:
            w = lut[enc.indices.to_numpy()]
        base = np.floor(w).astype(np.int64)
        frac = w - base
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids ^ np.uint64(MIX_SALT)) * np.uint64(MIX_MULT)) % np.uint64(MIX_MOD)
        # explicit floor: .astype truncates-toward-zero, which IS floor
        # for the non-negative frac — stated so the SQL twin mirrors it
        copies = base + (h < np.floor(frac * MIX_MOD).astype(np.uint64))
        total = int(copies.sum())
        rep = np.repeat(np.arange(n), copies)
        excl = np.concatenate([[0], np.cumsum(copies)[:-1]])
        out = batch.take(pa.array(rep, pa.int64()))
        copy_idx = np.arange(total, dtype=np.int64) - excl[rep]
        return out.append_column("copy_idx", pa.array(copy_idx, pa.int64()))

    return ds.map_batches(_fn, batch_format="pyarrow")
