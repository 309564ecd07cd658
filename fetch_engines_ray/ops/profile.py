"""One-pass distributed table profiler ("describe" for 100-TB tables).

Before any curation run over an unfamiliar corpus you want per-column
row/null counts, min/max, and approximate distinct cardinality — the
reference has no analog (it profiles nothing), but a training-data
pipeline at scale needs this as the first stage of every new source.

Scale shape: classic partial aggregation.  Each ``map_batches`` call
reduces its batch to ONE tiny partial row per column (counts, typed
min/max, a fixed 2^p-byte HLL register blob), so the only data that
ever leaves a worker is O(columns) bytes per block; the driver merges
O(blocks x columns) partials — no shuffle at all, one streaming pass
over the input.  Per-batch work is vectorized: Arrow ``null_count``,
``pyarrow.compute.min_max``, and the sketches module's numpy HLL
kernel.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .sketches import _estimate, _registers_for

_HLL_P = 12
_EMPTY_REGS = b""


def _batch_partials(batch: pa.Table, columns: list[str]) -> pa.Table:
    rows = []
    for name in columns:
        col = batch[name]
        n = len(col)
        nulls = col.null_count
        valid = col.drop_null()
        mn = mx = None
        if len(valid) > 0:
            try:
                mm = pc.min_max(valid)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                pass  # nested / unordered types: no extrema
        regs = _EMPTY_REGS
        if len(valid) > 0:
            try:
                regs = _registers_for(valid.to_pandas(), _HLL_P).tobytes()
            except TypeError:
                pass  # unhashable payloads (list columns): no sketch
        rows.append(
            {
                "column": name,
                "n_rows": n,
                "n_nulls": nulls,
                # typed extrema travel pickled (repr round-trips break
                # on datetimes); the driver merge compares TYPED values,
                # so numeric columns never fall back to string ordering
                "min_max": pickle.dumps((mn, mx)) if mn is not None else b"",
                "hll": regs,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("column", pa.string()),
                ("n_rows", pa.int64()),
                ("n_nulls", pa.int64()),
                ("min_max", pa.binary()),
                ("hll", pa.binary()),
            ]
        ),
    )


def _scan_partials(ds: "ray.data.Dataset", columns):
    """ONE per-block partials scan shared by profile_table and
    write_profile_artifact — two hand-copies of this block once drifted
    risk (review finding)."""
    columns = columns or ds.schema().names
    parts = ds.map_batches(
        lambda b: _batch_partials(b, columns),
        batch_format="pyarrow",
        batch_size=65536,
    ).to_pandas()
    return parts, columns


def profile_table(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Profile ``columns`` (default: every column) of ``ds`` in one
    streaming pass.  Returns one row per column:
    ``(column, n_rows, n_nulls, approx_distinct, min_repr, max_repr)``
    where min/max are string renderings of the exact typed extrema
    (empty for unordered types) and ``approx_distinct`` is the HLL
    estimate (p=12, ~1.6% std error) over non-null values, or NaN for
    unhashable payload columns.

    The merge is driver-side over per-block partials only — O(blocks x
    columns) tiny rows, never the data.
    """
    parts, columns = _scan_partials(ds, columns)
    return _render(_merge_partial_frame(parts, columns))


def _merge_partial_frame(parts: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """Merge partial rows (per block, or per RUN when merging saved
    artifacts) to one mergeable-state row per column: exact counts,
    typed pickled extrema, max-merged HLL registers.  HLL register max
    IS the union sketch, so merging artifacts from disjoint runs gives
    bit-identical registers to one pass over the concatenated data."""
    if "column" not in parts.columns:
        # an EMPTY dataset's to_pandas() is column-less (the recurring
        # empty-partition hazard): profile it as zero rows per column
        parts = pd.DataFrame(
            {"column": pd.Series(dtype=object), "n_rows": [], "n_nulls": [],
             "min_max": [], "hll": []}
        )
    rows = []
    for name in columns:
        p = parts[parts["column"] == name]
        regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
        sketched = False
        for blob in p["hll"]:
            if blob:
                regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
                sketched = True
        mn = mx = None
        for blob in p["min_max"]:
            if not blob:
                continue
            vmin, vmax = pickle.loads(blob)
            mn = vmin if mn is None or vmin < mn else mn
            mx = vmax if mx is None or vmax > mx else mx
        rows.append(
            {
                "column": name,
                "n_rows": int(p["n_rows"].sum()),
                "n_nulls": int(p["n_nulls"].sum()),
                "min_max": pickle.dumps((mn, mx)) if mn is not None else b"",
                "hll": regs.tobytes() if sketched else b"",
            }
        )
    return pd.DataFrame(rows, columns=["column", "n_rows", "n_nulls", "min_max", "hll"])


def _render(merged: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, r in merged.iterrows():
        mn = mx = None
        if r["min_max"]:
            mn, mx = pickle.loads(r["min_max"])
        n_valid = int(r["n_rows"]) - int(r["n_nulls"])
        out.append(
            {
                "column": r["column"],
                "n_rows": int(r["n_rows"]),
                "n_nulls": int(r["n_nulls"]),
                "approx_distinct": (
                    float(_estimate(np.frombuffer(r["hll"], dtype=np.uint8), _HLL_P))
                    if r["hll"]
                    else (0.0 if n_valid == 0 else float("nan"))
                ),
                "min_repr": "" if mn is None else str(mn),
                "max_repr": "" if mx is None else str(mx),
            }
        )
    return pd.DataFrame(
        out,
        columns=[
            "column",
            "n_rows",
            "n_nulls",
            "approx_distinct",
            "min_repr",
            "max_repr",
        ],
    )


def write_profile_artifact(
    ds: "ray.data.Dataset",
    path: str,
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Profile ``ds`` and persist the MERGEABLE state (one row per
    column: counts, pickled extrema, HLL registers) as a parquet
    artifact — the cross-run story: profile each crawl increment where
    it lands, then :func:`merge_profile_artifacts` folds any set of
    artifacts into the profile of the union without touching the data
    again.  Returns the rendered profile of this run."""
    parts, columns = _scan_partials(ds, columns)
    merged = _merge_partial_frame(parts, columns)
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
    import os

    os.replace(tmp, path)  # artifact appears atomically
    return _render(merged)


def merge_profile_artifacts(paths: list[str]) -> pd.DataFrame:
    """Fold saved profile artifacts into the profile of the UNION of
    their inputs: counts add, extrema compare typed, HLL registers
    max-merge (lossless for distinct-count union).  Driver-side over
    O(runs × columns) rows — never the data."""
    import pyarrow.parquet as pq

    frames = [pq.read_table(p).to_pandas() for p in paths]
    allp = pd.concat(frames, ignore_index=True)
    columns = list(dict.fromkeys(allp["column"]))
    return _render(_merge_partial_frame(allp, columns))


def pairwise_corr(
    ds: "ray.data.Dataset",
    columns: list[str],
) -> pd.DataFrame:
    """Pearson correlation / covariance matrix over numeric ``columns``
    in ONE streaming pass — the profiler's second-moment companion
    (feature-redundancy checks before training a quality classifier,
    sanity checks on derived signals).

    Scale shape: each batch reduces to one partial of O(cols^2) floats
    (row count, per-column sums, and the Gram matrix ``X.T @ X`` from a
    single BLAS call); the driver sums O(blocks) such partials — no
    shuffle, nothing row-sized leaves a worker.

    Null policy: rows with a null in ANY selected column are dropped
    (listwise deletion, one shared n for every pair — the standard
    correlation-matrix contract; DuckDB-parity under ``WHERE`` all
    columns are NOT NULL).  Sample covariance uses the n-1 denominator,
    matching DuckDB/numpy.

    Returns the upper triangle incl. the diagonal:
    ``(col_a, col_b, n, cov, corr)``; corr is NaN for zero-variance
    columns.
    """
    k = len(columns)

    def partial(batch: pa.Table) -> pa.Table:
        sub = batch.select(columns).drop_null()
        x = np.column_stack(
            [sub[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in columns]
        ) if sub.num_rows else np.empty((0, k))
        return pa.table(
            {
                "n": pa.array([sub.num_rows], type=pa.int64()),
                "sums": pa.array([x.sum(axis=0).tobytes()], type=pa.binary()),
                "gram": pa.array([(x.T @ x).tobytes()], type=pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    n = int(parts["n"].sum())
    sums = np.zeros(k)
    gram = np.zeros((k, k))
    for s, g in zip(parts["sums"], parts["gram"]):
        sums += np.frombuffer(s, dtype=np.float64)
        gram += np.frombuffer(g, dtype=np.float64).reshape(k, k)

    out = []
    for i in range(k):
        for j in range(i, k):
            if n >= 2:
                cov = (gram[i, j] - sums[i] * sums[j] / n) / (n - 1)
                var_i = (gram[i, i] - sums[i] ** 2 / n) / (n - 1)
                var_j = (gram[j, j] - sums[j] ** 2 / n) / (n - 1)
                denom = np.sqrt(var_i * var_j)
                corr = cov / denom if denom > 0 else float("nan")
            else:
                cov = corr = float("nan")
            out.append(
                {
                    "col_a": columns[i],
                    "col_b": columns[j],
                    "n": n,
                    "cov": cov,
                    "corr": corr,
                }
            )
    return pd.DataFrame(out, columns=["col_a", "col_b", "n", "cov", "corr"])
