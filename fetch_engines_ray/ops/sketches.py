"""Distributed sketches: HyperLogLog distinct counting.

The scale-right shape for COUNT(DISTINCT) over 10^12 rows: each block
reduces to a fixed 2^p-byte register array inside ``map_batches`` (the
"partial"), partials merge by elementwise max — a tiny driver-side
reduce over per-block sketches instead of an all-to-all shuffle of the
raw keys.  Standard HLL from the public literature (Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007), with the usual small-range linear-counting
correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFnV2

_HASH_KEY = "0123456789123456"  # pandas siphash key: fixed → cross-process stable


def _hash64(values) -> np.ndarray:
    s = pd.Series(values)
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()


def _registers_for(values, p: int) -> np.ndarray:
    """HLL register array (uint8, size 2^p) for one batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = 1 + number of leading zeros in the remaining bits
    # (use bit_length on the left-aligned remainder)
    nz = np.zeros(len(h), dtype=np.uint8)
    rem_nonzero = rem != 0
    # leading zeros of a 64-bit left-aligned value v: 64 - bit_length(v)
    bl = np.zeros(len(h), dtype=np.int64)
    v = rem[rem_nonzero]
    # vectorized bit_length via log2 is float-unsafe near 2^63; use
    # np.frexp on float64 only for exponent-safe values — instead do it
    # with a 4-step de Bruijn-free shift count (uint64-safe, all numpy)
    lz = np.full(v.shape, 0, dtype=np.uint64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint64(shift)
        x[mask] <<= np.uint64(shift)
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)  # all-zero remainder
    rho_nz = (lz + 1).astype(np.uint8)
    rho_nz = np.minimum(rho_nz, 64 - p + 1)
    rho[rem_nonzero] = rho_nz
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


class HllDistinct(AggregateFnV2):
    """``approx COUNT(DISTINCT on)`` as a first-class Ray Data
    aggregation: ``ds.aggregate(HllDistinct(on="user_id"))`` or
    ``ds.groupby(k).aggregate(HllDistinct(on="user_id"))``.

    The accumulator is the fixed 2^p-byte HLL register blob; blocks
    reduce to one blob each (``aggregate_block``), blobs merge by
    elementwise max (``combine``) — nothing that scales with raw
    cardinality ever moves, which is the whole point at 10^12 rows.
    Nulls are skipped (matching SQL COUNT(DISTINCT)).
    """

    def __init__(self, on: str, p: int = 12, alias_name: str | None = None):
        self._p = p
        m = 1 << p
        super().__init__(
            alias_name or f"hll_distinct({on})",
            zero_factory=lambda: bytes(m),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        return _registers_for(col.drop_null().to_pylist(), self._p).tobytes()

    def combine(self, current_accumulator: bytes, new: bytes) -> bytes:
        return np.maximum(
            np.frombuffer(current_accumulator, dtype=np.uint8),
            np.frombuffer(new, dtype=np.uint8),
        ).tobytes()

    def finalize(self, accumulator: bytes) -> float:
        return _estimate(np.frombuffer(accumulator, dtype=np.uint8), self._p)


def hll_distinct(ds: "ray.data.Dataset", column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column).  ~1.04/sqrt(2^p) std error
    (p=12 → ~1.6%)."""
    return float(ds.aggregate(HllDistinct(on=column, p=p, alias_name="approx_distinct"))["approx_distinct"])


def hll_distinct_by_key(
    ds: "ray.data.Dataset", key: str, column: str, p: int = 12
) -> pd.DataFrame:
    """Approximate distinct(column) per key value, via the
    :class:`HllDistinct` aggregation (per-block partial sketches merge
    by max inside Ray's aggregate — one tiny shuffle of fixed-size
    blobs regardless of raw cardinality)."""
    out = (
        ds.groupby(key)
        .aggregate(HllDistinct(on=column, p=p, alias_name="approx_distinct"))
        .to_pandas()
    )
    out["approx_distinct"] = out["approx_distinct"].round().astype("int64")
    return out.sort_values(key).reset_index(drop=True)
