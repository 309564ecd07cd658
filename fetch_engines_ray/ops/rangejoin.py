"""Range (interval) join: points joined to the intervals containing
them.

Ray Data has no inequality-join primitive; the scale shape is GRID
BUCKETING: pick a cell width, replicate each interval to every cell it
overlaps, bucket each point to its single cell, then one
``groupby(cell).map_groups`` verifies containment locally — the only
all-to-all moves (cell, id, value) triples, and interval replication is
bounded by interval_width / cell_width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def interval_join_counts(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_val: str,
    point_id: str,
    lo_col: str,
    hi_col: str,
    interval_id: str,
    cell_width: float,
) -> pd.DataFrame:
    """(interval_id, n_points) for every interval containing ≥1 point.

    ``cell_width`` should be on the order of the typical interval width
    (replication factor ≈ width/cell_width + 1).
    """

    def point_cells(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[point_val].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "cell": pa.array(np.floor(v / cell_width).astype(np.int64)),
                "kind": pa.array(np.zeros(len(v), dtype=np.int8)),
                "id": pa.array(batch[point_id].to_pylist(), type=pa.int64()),
                "lo": pa.array(v),
                "hi": pa.array(v),
            }
        )

    def interval_cells(batch: pa.Table) -> pa.Table:
        # fully vectorized replication: per-interval cell counts drive
        # ONE np.repeat, the within-interval cell offset falls out of a
        # cumsum — no per-row Python (replication factor stays bounded
        # by interval_width / cell_width + 1)
        lo = np.asarray(batch[lo_col].to_pylist(), dtype=np.float64)
        hi = np.asarray(batch[hi_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(batch[interval_id].to_pylist(), dtype=np.int64)
        valid = hi >= lo
        lo, hi, ids = lo[valid], hi[valid], ids[valid]
        c0 = np.floor(lo / cell_width).astype(np.int64)
        c1 = np.floor(hi / cell_width).astype(np.int64)
        counts = c1 - c0 + 1
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        starts = np.cumsum(counts) - counts
        offsets = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "cell": pa.array(c0[idx] + offsets),
                "kind": pa.array(np.ones(len(idx), dtype=np.int8)),
                "id": pa.array(ids[idx]),
                "lo": pa.array(lo[idx]),
                "hi": pa.array(hi[idx]),
            }
        )

    tagged = points.map_batches(point_cells, batch_format="pyarrow", batch_size=65536).union(
        intervals.map_batches(interval_cells, batch_format="pyarrow", batch_size=65536)
    )

    def join_cell(group: pd.DataFrame) -> pd.DataFrame:
        pts = group[group["kind"] == 0]
        ivs = group[group["kind"] == 1]
        if pts.empty or ivs.empty:
            # typed empty frame: object-dtype columns break Ray Data's
            # schema unification when every group in a block is empty
            return pd.DataFrame(
                {
                    "interval_id": pd.Series(dtype="int64"),
                    "n_points": pd.Series(dtype="int64"),
                }
            )
        pv = np.sort(pts["lo"].to_numpy())
        lo = ivs["lo"].to_numpy()
        hi = ivs["hi"].to_numpy()
        # per interval: count of points in [lo, hi] within THIS cell
        # (each point lives in exactly one cell → no double counting)
        counts = np.searchsorted(pv, hi, side="right") - np.searchsorted(pv, lo, side="left")
        keep = counts > 0
        return pd.DataFrame(
            {"interval_id": ivs["id"].to_numpy()[keep], "n_points": counts[keep].astype("int64")}
        )

    per_cell = tagged.groupby("cell").map_groups(join_cell, batch_format="pandas")
    out = per_cell.groupby("interval_id").sum(on="n_points").to_pandas()
    if out.empty or "interval_id" not in out.columns:
        # zero matches anywhere (small inputs): stable empty schema
        return pd.DataFrame(
            {
                "interval_id": pd.Series(dtype="int64"),
                "n_points": pd.Series(dtype="int64"),
            }
        )
    col = "sum(n_points)" if "sum(n_points)" in out.columns else "n_points"
    out = out.rename(columns={col: "n_points"})
    out["n_points"] = out["n_points"].astype("int64")
    return out.sort_values("interval_id").reset_index(drop=True)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    direction: str = "backward",
    tolerance=None,
    n_parts: int = 64,
    right_suffix: str = "_right",
) -> "ray.data.Dataset":
    """Generic distributed AS-OF join (the time-series join Ray Data
    lacks): for each left row, attach the nearest right row with the
    same ``by`` key and ``on`` value <= (backward), >= (forward), or
    closest (nearest), optionally within ``tolerance``.

    Scale shape (the window.py rule — never per-key dispatch): both
    sides get a bounded hash partition of the ``by`` key, ride ONE
    tagged union exchange, and each partition runs a single C-level
    ``pandas.merge_asof(by=...)`` — so the wide cost is one shuffle of
    the two inputs regardless of key cardinality.  Column collisions
    on the right side take ``right_suffix``; unmatched left rows
    survive with nulls (left-join semantics, like SQL ASOF LEFT JOIN).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction {direction!r}")
    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    # resolve right-side name collisions (except the join keys, which
    # merge_asof consumes) exactly once, before the union
    renames = {
        c: c + right_suffix
        for c in right_cols
        if c in left_cols and c not in (on, by)
    }
    if renames:
        right = right.rename_columns(renames)
        right_cols = [renames.get(c, c) for c in right_cols]
    value_cols = [c for c in right_cols if c not in (on, by)]

    def tag(side: int, other_cols: list):
        def f(batch: pa.Table) -> pa.Table:
            batch = batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, dtype=np.int64))
            )
            from .window import hash_part

            batch = batch.append_column(
                "__part", pa.array(hash_part(batch[by].to_pylist(), n_parts))
            )
            for c in other_cols:  # null-fill the other side's columns
                batch = batch.append_column(c, pa.nulls(batch.num_rows))
            return batch

        return f

    lt = left.map_batches(tag(0, []), batch_format="pyarrow", batch_size=8192)
    # left columns the right side lacks get null-filled so the union
    # schemas line up; select_columns pins identical column ORDER
    rt = right.map_batches(
        tag(1, [c for c in left_cols if c not in (on, by)]),
        batch_format="pyarrow",
        batch_size=8192,
    )
    all_cols = [on, by] + [c for c in left_cols if c not in (on, by)] + value_cols
    lt_full = lt.map_batches(
        lambda b: pa.table(
            {
                c: b[c] if c in b.column_names else pa.nulls(b.num_rows)
                for c in all_cols + ["__side", "__part"]
            }
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )
    rt_full = rt.select_columns(all_cols + ["__side", "__part"])

    def join_part(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0].drop(columns=["__side", "__part"] + value_cols)
        r = group[group["__side"] == 1][[on, by] + value_cols]
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(on, kind="mergesort")
        if len(l) == 0:
            return l.assign(**{c: pd.Series(dtype="float64") for c in value_cols})
        out = pd.merge_asof(
            l,
            r,
            on=on,
            by=by,
            direction=direction,
            tolerance=tolerance,
        )
        return out

    tagged = lt_full.union(rt_full)
    return tagged.groupby("__part").map_groups(join_part, batch_format="pandas")
