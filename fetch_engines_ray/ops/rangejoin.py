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
        lo = np.asarray(batch[lo_col].to_pylist(), dtype=np.float64)
        hi = np.asarray(batch[hi_col].to_pylist(), dtype=np.float64)
        ids = batch[interval_id].to_pylist()
        out_cell, out_id, out_lo, out_hi = [], [], [], []
        for l, h, i in zip(lo, hi, ids):
            if h < l:
                continue
            for c in range(int(np.floor(l / cell_width)), int(np.floor(h / cell_width)) + 1):
                out_cell.append(c)
                out_id.append(i)
                out_lo.append(l)
                out_hi.append(h)
        n = len(out_cell)
        return pa.table(
            {
                "cell": pa.array(out_cell, type=pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "id": pa.array(out_id, type=pa.int64()),
                "lo": pa.array(out_lo, type=pa.float64()),
                "hi": pa.array(out_hi, type=pa.float64()),
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
