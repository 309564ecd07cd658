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
    rem_nonzero = rem != 0
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


# ---------------------------------------------------------------------------
# Approximate quantiles: two-pass fixed-width histogram
# ---------------------------------------------------------------------------

class HistogramSketch(AggregateFnV2):
    """Fixed-width histogram over a known [lo, hi] domain as a Ray Data
    aggregation — the quantile analog of :class:`HllDistinct`.

    Accumulator = int64 count array of ``bins`` buckets (+1 overflow
    bucket for values == hi); blocks reduce to one array each, arrays
    merge by elementwise add — exactly mergeable, block-order
    independent, and nothing that scales with row count ever moves.
    Values outside [lo, hi] clamp to the edge buckets.
    """

    def __init__(
        self,
        on: str,
        lo: float,
        hi: float,
        bins: int = 4096,
        alias_name: str | None = None,
    ):
        if not hi > lo:
            raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
        self._lo, self._hi, self._bins = float(lo), float(hi), int(bins)
        super().__init__(
            alias_name or f"histogram({on})",
            zero_factory=lambda: bytes(8 * (bins + 1)),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        v = np.asarray(col.drop_null().to_pylist(), dtype=np.float64)
        counts = np.zeros(self._bins + 1, dtype=np.int64)
        if len(v):
            scaled = (v - self._lo) / (self._hi - self._lo) * self._bins
            idx = np.clip(np.floor(scaled).astype(np.int64), 0, self._bins)
            np.add.at(counts, idx, 1)
        return counts.tobytes()

    def combine(self, current_accumulator: bytes, new: bytes) -> bytes:
        return (
            np.frombuffer(current_accumulator, dtype=np.int64)
            + np.frombuffer(new, dtype=np.int64)
        ).tobytes()

    def finalize(self, accumulator: bytes) -> bytes:
        return accumulator  # counts blob; quantile interpolation is driver-side


def quantiles_from_histogram(
    blob: bytes, lo: float, hi: float, qs: list[float]
) -> list[float]:
    """Interpolated quantiles from a histogram blob; error is bounded by
    one bucket width = (hi - lo) / bins."""
    counts = np.frombuffer(blob, dtype=np.int64).astype(np.float64)
    bins = len(counts) - 1
    total = counts.sum()
    if total == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(counts)
    width = (hi - lo) / bins
    out = []
    for q in qs:
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, bins)
        prev = cum[b - 1] if b > 0 else 0.0
        inbin = counts[b]
        frac = (target - prev) / inbin if inbin > 0 else 0.0
        # clamp: frac=1 in the overflow bucket would otherwise report
        # hi + width, a value strictly above every observation
        out.append(min(lo + (b + frac) * width, hi))
    return out


def approx_quantiles(
    ds: "ray.data.Dataset", column: str, qs: list[float], bins: int = 4096
) -> list[float]:
    """Two-pass distributed approximate quantiles: pass 1 is Ray's
    built-in min/max aggregate (cheap, streaming), pass 2 the
    fixed-width :class:`HistogramSketch`.  Error <= (max-min)/bins per
    quantile; both passes move only O(bins) bytes per block."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(column, alias_name="lo"), Max(column, alias_name="hi"))
    if mm["lo"] is None:  # empty / all-null column
        raise ValueError(
            f"approx_quantiles: column {column!r} has no non-null values"
        )
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi == lo:
        return [lo] * len(qs)
    blob = ds.aggregate(
        HistogramSketch(on=column, lo=lo, hi=hi, bins=bins, alias_name="hist")
    )["hist"]
    return quantiles_from_histogram(blob, lo, hi, qs)


def grouped_quantiles(
    ds: "ray.data.Dataset",
    key: str,
    column: str,
    qs: list[float],
    bins: int = 1024,
) -> pd.DataFrame:
    """Per-group approximate quantiles (e.g. per-domain length
    percentiles) with O(bins) state per group: one global min/max pass
    fixes the shared domain, one ``groupby(key)`` merges per-group
    :class:`HistogramSketch` blobs (elementwise add — exactly
    mergeable), and the interpolation is group-count-sized driver work.
    Error per quantile <= (max-min)/bins.  Returns one row per group
    with a ``q{q}`` column per requested quantile."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(column, alias_name="lo"), Max(column, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    cols = [f"q{q:g}" for q in qs]
    if hi == lo:
        groups = ds.groupby(key).count().to_pandas()  # bounded: one row/group
        out = groups[[key]].copy()
        for c in cols:
            out[c] = lo
        return out.sort_values(key).reset_index(drop=True)
    rows = (
        ds.groupby(key)
        .aggregate(HistogramSketch(on=column, lo=lo, hi=hi, bins=bins, alias_name="hist"))
        .to_pandas()  # bounded: one row per group
    )
    vals = np.array(
        [quantiles_from_histogram(b, lo, hi, qs) for b in rows["hist"]],
        dtype=np.float64,
    ).reshape(len(rows), len(qs))
    out = rows[[key]].copy()
    for i, c in enumerate(cols):
        out[c] = vals[:, i]
    return out.sort_values(key).reset_index(drop=True)


class IntHistogram(AggregateFnV2):
    """Integer-bucketed histogram over ``[lo, hi]`` (inclusive): bucket
    ``b`` covers the integer interval ``[lo + b*width, lo + (b+1)*width)``
    with an integer ``width``, so bucket membership is exact — the
    building block for :func:`exact_int_quantiles`."""

    def __init__(self, on: str, lo: int, hi: int, width: int, nbuckets: int, alias_name=None):
        self._lo, self._width, self._n = int(lo), int(width), int(nbuckets)
        super().__init__(
            alias_name or f"int_histogram({on})",
            zero_factory=lambda: bytes(8 * nbuckets),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.zeros(self._n, dtype=np.int64)
        if len(v):
            idx = np.clip((v - self._lo) // self._width, 0, self._n - 1)
            np.add.at(counts, idx, 1)
        return counts.tobytes()

    def combine(self, a: bytes, b: bytes) -> bytes:
        return (np.frombuffer(a, dtype=np.int64) + np.frombuffer(b, dtype=np.int64)).tobytes()

    def finalize(self, accumulator: bytes) -> bytes:
        return accumulator


class MultiRangeIntHistogram(AggregateFnV2):
    """Several :class:`IntHistogram`\\ s over DIFFERENT ``[lo, hi]``
    ranges of the same column in ONE streaming pass — values outside a
    range are MASKED (not clipped), so the input needs no per-range
    filter.  ``ranges`` is ``[(lo, width, nbuckets), ...]``; the
    accumulator concatenates the per-range count arrays.  This is what
    lets :func:`exact_int_quantiles` narrow EVERY requested rank per
    level with one aggregate instead of one filtered pass per rank."""

    def __init__(self, on: str, ranges: list, alias_name=None):
        self._ranges = [(int(lo), int(w), int(n)) for lo, w, n in ranges]
        self._total = sum(n for _, _, n in self._ranges)
        total = self._total
        super().__init__(
            alias_name or f"multi_int_histogram({on})",
            zero_factory=lambda: bytes(8 * total),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.zeros(self._total, dtype=np.int64)
        off = 0
        for lo, width, n in self._ranges:
            if len(v):
                idx = (v - lo) // width
                m = (idx >= 0) & (idx < n)
                np.add.at(counts[off : off + n], idx[m], 1)
            off += n
        return counts.tobytes()

    def combine(self, a: bytes, b: bytes) -> bytes:
        return (np.frombuffer(a, dtype=np.int64) + np.frombuffer(b, dtype=np.int64)).tobytes()

    def finalize(self, accumulator: bytes) -> bytes:
        return accumulator


def exact_int_quantiles(
    ds: "ray.data.Dataset", column: str, ranks: list[int], bins: int = 4096
) -> list[int]:
    """EXACT order statistics of an int64 column at the given 0-indexed
    ``ranks`` — without sorting and without streaming rows through the
    driver (the scale-killer the sorted-scan form had: picking the 0.95
    quantile pulled ~95 % of all rows through one process).

    Iterative histogram narrowing: each level is ONE streaming
    ``IntHistogram`` aggregate over the (range-filtered) column; the
    bucket containing the rank becomes the next level's range.  Integer
    widths shrink the range ≥ ``bins``× per level, so full-int64 data
    resolves in ≤ 5 levels and typical bounded scores in 1-2; driver
    state is O(bins) per level.  Exactness: buckets partition the
    integers, so the rank's bucket — and, once ``width == 1``, the
    rank's exact value — follows from the counts alone.
    """
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(column, alias_name="lo"), Max(column, alias_name="hi"))
    if mm["lo"] is None:
        return []
    g_lo, g_hi = int(mm["lo"]), int(mm["hi"])

    def _geom(lo: int, hi: int) -> tuple[int, int]:
        span = hi - lo + 1
        width = -(-span // bins)  # ceil: integer bucket width >= 1
        return width, -(-span // width)

    # Per-rank narrowing state; EVERY pending rank narrows one level per
    # streaming pass via MultiRangeIntHistogram (one filtered aggregate
    # per rank per level would scan the dataset len(ranks)x per level).
    # Ranks sharing a range share one histogram slot.
    states = [(g_lo, g_hi, int(r)) for r in ranks]
    out: list = [None] * len(ranks)
    for i, (lo, hi, _r) in enumerate(states):
        if hi <= lo:
            out[i] = lo
    while any(v is None for v in out):
        pending = [i for i, v in enumerate(out) if v is None]
        uniq: dict[tuple[int, int], int] = {}
        ranges = []
        for i in pending:
            lo, hi, _ = states[i]
            if (lo, hi) not in uniq:
                uniq[(lo, hi)] = len(ranges)
                w, n_b = _geom(lo, hi)
                ranges.append((lo, w, n_b))
        blob = ds.aggregate(
            MultiRangeIntHistogram(column, ranges, alias_name="h")
        )["h"]
        counts = np.frombuffer(blob, dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum([n for _, _, n in ranges])))
        for i in pending:
            lo, hi, r = states[i]
            slot = uniq[(lo, hi)]
            w = ranges[slot][1]
            cum = np.cumsum(counts[offsets[slot] : offsets[slot + 1]])
            b = int(np.searchsorted(cum, r + 1, side="left"))
            r -= int(cum[b - 1]) if b > 0 else 0
            lo, hi = lo + b * w, min(hi, lo + (b + 1) * w - 1)
            if w == 1 or hi <= lo:
                out[i] = lo
            else:
                states[i] = (lo, hi, r)
    return out


def grouped_exact_int_quantiles(
    ds: "ray.data.Dataset",
    key: str,
    column: str,
    qs: list[float],
    bins: int = 4096,
) -> pd.DataFrame:
    """EXACT per-group quantiles of an int64 column, DuckDB
    ``quantile_disc`` convention (rank ``max(0, ceil(q*n) - 1)`` within
    the group's sorted values) — without a sort, without ``map_groups``
    over data-sized groups, and without streaming rows through the
    driver.

    The multi-group form of :func:`exact_int_quantiles`: every unresolved
    ``(group, q)`` pair is a STATE ``(lo, hi, rank-within-range)``; each
    level runs ONE ``map_batches`` pass emitting per-state bucket counts
    (long ``(state, bucket, n)`` rows, <= states x bins per block) plus
    one tiny groupby-sum, then every state narrows to the bucket holding
    its rank.  Integer bucket widths shrink each state's range >= bins x
    per level, so full-int64 domains resolve in <= 5 levels and bounded
    scores in 1-2 — each level's cost is one streaming pass over the
    column regardless of group count.  Driver state is
    O(groups x len(qs) x bins), never row-scaled; the group key must be
    bounded-cardinality (the same contract as any wide GROUP BY).

    Returns one row per group: ``key, q{q}...`` columns, sorted by key.
    """
    import math

    import ray as _ray
    from ray.data.aggregate import Count as _Count, Max as _Max, Min as _Min

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select([key, column])
        return t.filter(pa.compute.is_valid(t[column]))

    vals = ds.map_batches(project, batch_format="pyarrow", batch_size=65536)
    base = (
        vals.groupby(key)
        .aggregate(
            _Count(alias_name="n"),
            _Min(column, alias_name="lo"),
            _Max(column, alias_name="hi"),
        )
        .to_pandas()  # bounded: one row per group
    )

    # state per (group, q): [key, lo, hi, remaining-rank]; resolved when lo == hi
    states: list[list] = []
    for _, row in base.iterrows():
        n = int(row["n"])
        for q in qs:
            r = max(0, math.ceil(q * n) - 1)
            states.append([row[key], int(row["lo"]), int(row["hi"]), r])

    while True:
        active = [i for i, s in enumerate(states) if s[1] < s[2]]
        if not active:
            break
        meta = []  # (state_id, key, lo, hi, width, nbuckets)
        for i in active:
            k, lo, hi, _ = states[i]
            span = hi - lo + 1
            width = -(-span // bins)
            meta.append((i, k, lo, hi, width, -(-span // width)))
        meta_ref = _ray.put(meta)

        def level_partial(batch: pa.Table) -> pa.Table:
            m = _ray.get(meta_ref)
            keys = np.asarray(batch[key].to_pylist(), dtype=object)
            v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
            sids: list[np.ndarray] = []
            bks: list[np.ndarray] = []
            ns: list[np.ndarray] = []
            for sid, k, lo, hi, width, nb in m:
                mask = (keys == k) & (v >= lo) & (v <= hi)
                if not mask.any():
                    continue
                c = np.bincount((v[mask] - lo) // width, minlength=nb)
                nz = np.nonzero(c)[0]
                sids.append(np.full(len(nz), sid, dtype=np.int64))
                bks.append(nz.astype(np.int64))
                ns.append(c[nz].astype(np.int64))
            if not sids:
                return pa.table(
                    {"state": pa.array([], type=pa.int64()),
                     "bucket": pa.array([], type=pa.int64()),
                     "n": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"state": pa.array(np.concatenate(sids)),
                 "bucket": pa.array(np.concatenate(bks)),
                 "n": pa.array(np.concatenate(ns))}
            )

        from ray.data.aggregate import Sum as _Sum

        hist = (
            vals.map_batches(level_partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["state", "bucket"])
            .aggregate(_Sum("n", alias_name="n"))
            .to_pandas()  # bounded: <= len(active) x bins rows
        )
        by_state = {sid: grp for sid, grp in hist.groupby("state")}
        for sid, k, lo, hi, width, nb in meta:
            grp = by_state[sid].sort_values("bucket")
            cum = grp["n"].to_numpy().cumsum()
            buckets = grp["bucket"].to_numpy()
            j = int(np.searchsorted(cum, states[sid][3] + 1, side="left"))
            b = int(buckets[j])
            states[sid][3] -= int(cum[j - 1]) if j > 0 else 0
            states[sid][1] = lo + b * width
            states[sid][2] = min(hi, lo + (b + 1) * width - 1)

    out_rows: dict = {}
    si = 0
    for _, row in base.iterrows():
        rec = out_rows.setdefault(row[key], {})
        for q in qs:
            rec[f"q{q:g}"] = states[si][1]
            si += 1
    out = pd.DataFrame(
        [{key: k, **rec} for k, rec in out_rows.items()]
    ).sort_values(key).reset_index(drop=True)
    for q in qs:
        out[f"q{q:g}"] = out[f"q{q:g}"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Heavy hitters: mergeable Misra-Gries summary
# ---------------------------------------------------------------------------

def _mg_trim(counters: dict, k: int) -> dict:
    """Keep <= k counters by subtracting the (k+1)-th largest count from
    every counter and dropping non-positives (standard mergeable
    Misra-Gries reduction, Agarwal et al., 'Mergeable Summaries')."""
    if len(counters) <= k:
        return counters
    kth = sorted(counters.values(), reverse=True)[k]
    return {key: c - kth for key, c in counters.items() if c > kth}


class HeavyHitters(AggregateFnV2):
    """Misra-Gries top-k sketch as a Ray Data aggregation.

    Accumulator = dict of <= k (value, lower-bound count) pairs; blocks
    reduce with exact per-block value_counts then a trim, partials merge
    by counter addition + trim.  Guarantee: any value with true
    frequency > N/(k+1) survives, and every kept count undercounts by at
    most N/(k+1) — planted heavy hitters are test-verified.  The sketch
    moves O(k) entries per block regardless of cardinality.
    """

    def __init__(self, on: str, k: int = 16, alias_name: str | None = None):
        self._k = int(k)
        super().__init__(
            alias_name or f"heavy_hitters({on})",
            zero_factory=dict,
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> dict:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        vals, counts = np.unique(
            np.asarray(col.drop_null().to_pylist(), dtype=object), return_counts=True
        )
        return _mg_trim(
            {v: int(c) for v, c in zip(vals.tolist(), counts.tolist())}, self._k
        )

    def combine(self, current_accumulator: dict, new: dict) -> dict:
        merged = dict(current_accumulator)
        for v, c in new.items():
            merged[v] = merged.get(v, 0) + c
        return _mg_trim(merged, self._k)

    def finalize(self, accumulator: dict) -> dict:
        return accumulator


def heavy_hitters(ds: "ray.data.Dataset", column: str, k: int = 16) -> pd.DataFrame:
    """(value, min_count) rows for the <= k Misra-Gries survivors,
    sorted by descending lower-bound count."""
    counters = ds.aggregate(HeavyHitters(on=column, k=k, alias_name="hh"))["hh"]
    rows = sorted(counters.items(), key=lambda t: (-t[1], str(t[0])))
    return pd.DataFrame(rows, columns=["value", "min_count"])


def heavy_hitters_exact(
    ds: "ray.data.Dataset", column: str, k: int = 16, capacity: int = 4096
) -> pd.DataFrame:
    """EXACT top-``k`` most frequent values, two streaming passes:

    1. the Misra-Gries sketch above with ``capacity`` counters yields a
       candidate superset (any value with frequency > N/(capacity+1)
       survives — Misra & Gries 1982, mergeable form Agarwal et al.
       PODS 2012);
    2. a second pass recounts ONLY the candidates exactly — per-block
       ``value_counts`` restricted to the broadcast candidate set, then
       a candidate-sized groupby-sum (the shuffle moves <= capacity
       rows per block, never one row per occurrence).

    A full ``groupby(value).count()`` would shuffle every distinct
    value — billions of singleton typo/number strings on web text; this
    form's state is O(capacity) everywhere.  Returns ``value, count``
    (exact) descending, ties by value; ``df.attrs["exact_topk"]`` is
    True when the k-th count clears the survival bound, i.e. no value
    outside the candidate set could displace the reported top-k.
    """
    import ray as _ray
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    if not 1 <= k <= capacity:
        raise ValueError("need 1 <= k <= capacity")
    agg = ds.aggregate(
        HeavyHitters(on=column, k=capacity, alias_name="hh"),
        _Count(alias_name="n_rows"),
    )
    sketch, n_total = agg["hh"], int(agg["n_rows"])
    if not sketch:
        out = pd.DataFrame({"value": pd.Series([], dtype=object), "count": pd.Series([], dtype="int64")})
        out.attrs["exact_topk"] = True
        return out
    cand_ref = _ray.put(set(sketch))

    def count_candidates(batch: pa.Table) -> pa.Table:
        cand = _ray.get(cand_ref)
        col_type = batch.column(column).type
        vc = batch.column(column).to_pandas().value_counts()
        vc = vc[vc.index.isin(cand)]
        # type the value column from the INPUT even when this block has
        # zero candidate matches — pa.array([]) is null-typed, and the
        # downstream groupby dies unifying it with non-empty blocks'
        # string/int schema (same hazard rangejoin.join_cell guards)
        return pa.table(
            {
                "value": pa.array(vc.index.tolist(), type=col_type),
                "n": pa.array(vc.to_numpy(), type=pa.int64()),
            }
        )

    exact = (
        ds.map_batches(count_candidates, batch_format="pyarrow", batch_size=65536)
        .groupby("value")
        .aggregate(_Sum("n", alias_name="count"))
        .to_pandas()  # bounded: <= capacity rows
    )
    out = (
        exact.sort_values(["count", "value"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    kth = int(out["count"].iloc[-1]) if len(out) == k else 0
    out.attrs["exact_topk"] = len(out) < k or kth > n_total // (capacity + 1)
    return out


# ---------------------------------------------------------------------------
# Bloom filter: compact distributed membership index
# ---------------------------------------------------------------------------

def _splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 mix (public constants) over uint64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(values, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch &
    Mitzenmacher: two hash functions suffice for k indexes)."""
    h1 = _hash64(values)
    h2 = _splitmix64_vec(h1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _bloom_set(values, m_bits: int, k: int) -> np.ndarray:
    """Bit array (uint8, m_bits/8 bytes) with every value's k bits set."""
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    if len(values) == 0:
        return bits
    pos = _bloom_positions(values, m_bits, k).reshape(-1)
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_contains(blob: bytes, values, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set.
    No false negatives; false-positive rate ≈ (1 - e^(-k*n/m))^k."""
    bits = np.frombuffer(blob, dtype=np.uint8)
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(values, m_bits, k)
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)


class BloomFilter(AggregateFnV2):
    """Distributed Bloom-filter build as a first-class aggregation:
    ``blob = ds.aggregate(BloomFilter(on="url", m_bits=1<<23))[...]``.

    Same partial-aggregation shape as :class:`HllDistinct`: each block
    reduces to one fixed-size bit array, partials merge by bitwise OR —
    the blob size is set by the TARGET capacity, never by row count.
    The finalized blob is the broadcastable membership index for
    "seen before?" filtering at ingest (``ray.put`` once, probe with
    :func:`bloom_contains` inside ``map_batches``).  Size ``m_bits`` ≈
    10 bits/key with k=7 for ~1% false positives (standard sizing).
    """

    def __init__(
        self,
        on: str,
        m_bits: int = 1 << 20,
        k: int = 7,
        alias_name: str | None = None,
    ):
        assert m_bits % 8 == 0, "m_bits must be a multiple of 8"
        self._m = m_bits
        self._k = k
        super().__init__(
            alias_name or f"bloom({on})",
            zero_factory=lambda: bytes(m_bits >> 3),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        return _bloom_set(col.drop_null().to_pylist(), self._m, self._k).tobytes()

    def combine(self, current_accumulator: bytes, new: bytes) -> bytes:
        return np.bitwise_or(
            np.frombuffer(current_accumulator, dtype=np.uint8),
            np.frombuffer(new, dtype=np.uint8),
        ).tobytes()

    def finalize(self, accumulator: bytes) -> bytes:
        return accumulator


def bloom_build(
    ds: "ray.data.Dataset", column: str, m_bits: int = 1 << 20, k: int = 7
) -> bytes:
    """Build a membership blob over a column (one streaming pass)."""
    return ds.aggregate(BloomFilter(on=column, m_bits=m_bits, k=k, alias_name="bloom"))[
        "bloom"
    ]


def bloom_filter_new(
    ds: "ray.data.Dataset",
    blob: bytes,
    column: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> "ray.data.Dataset":
    """Keep only rows whose ``column`` value is NOT in the blob — the
    ingest-side "drop everything we've seen" filter.  The blob is
    ``ray.put`` once and read zero-copy per task; no shuffle.  Bloom
    false positives drop a ~FP-rate sliver of genuinely-new rows
    (never the reverse), the standard trade for O(bits) memory."""
    import ray as _ray

    blob_ref = _ray.put(blob)

    def keep_new(batch: pa.Table) -> pa.Table:
        b = _ray.get(blob_ref)
        seen = bloom_contains(b, batch[column].to_pylist(), m_bits, k)
        return batch.filter(pa.array(~seen))

    return ds.map_batches(keep_new, batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# Count-min sketch (point-frequency estimates under memory bound)
# ---------------------------------------------------------------------------

_CM_MIX = np.uint64(0x9E3779B97F4A7C15)  # public splitmix64 constant


def _cm_indices(values, width: int, depth: int) -> np.ndarray:
    """[depth, n] column indices via Kirsch-Mitzenmacher double hashing
    (g_j = h1 + j*h2): two base hashes derive all rows, vectorized."""
    h1 = _hash64(values)
    h2 = (h1 ^ (h1 >> np.uint64(31))) * _CM_MIX | np.uint64(1)  # odd → full period
    j = np.arange(depth, dtype=np.uint64)[:, None]
    return ((h1[None, :] + j * h2[None, :]) % np.uint64(width)).astype(np.int64)


class CountMin(AggregateFnV2):
    """Count-min sketch as a Ray Data aggregation: a depth x width
    int64 counter matrix; blocks build partial matrices vectorized
    (np.add.at over double-hashed indices), partials merge by exact
    element-wise addition — so the distributed build is bit-identical
    to a single-pass build regardless of partitioning.  Standard
    guarantee: estimate >= true count, and overshoot <= e/width * N
    with probability 1 - exp(-depth)."""

    def __init__(
        self, on: str, width: int = 2048, depth: int = 4, alias_name: str | None = None
    ):
        self._w, self._d = int(width), int(depth)
        super().__init__(
            alias_name or f"count_min({on})",
            zero_factory=lambda: np.zeros((self._d, self._w), dtype=np.int64),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        from ray.data.block import BlockAccessor

        col = BlockAccessor.for_block(block).to_arrow().column(self._target_col_name)
        vals = col.drop_null().to_pylist()
        m = np.zeros((self._d, self._w), dtype=np.int64)
        if not vals:
            return m
        idx = _cm_indices(vals, self._w, self._d)
        for j in range(self._d):
            np.add.at(m[j], idx[j], 1)
        return m

    def combine(self, current_accumulator: np.ndarray, new: np.ndarray) -> np.ndarray:
        return current_accumulator + new

    def finalize(self, accumulator: np.ndarray) -> np.ndarray:
        return accumulator


def count_min_build(
    ds: "ray.data.Dataset", column: str, width: int = 2048, depth: int = 4
) -> np.ndarray:
    """Build the sketch matrix over a column (one streaming pass)."""
    return ds.aggregate(CountMin(on=column, width=width, depth=depth, alias_name="cm"))["cm"]


def count_min_estimate(sketch: np.ndarray, values) -> np.ndarray:
    """Point-frequency estimates (int64, one per queried value)."""
    depth, width = sketch.shape
    idx = _cm_indices(list(values), width, depth)
    return np.min(
        np.stack([sketch[j, idx[j]] for j in range(depth)], axis=0), axis=0
    )
