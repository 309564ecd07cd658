"""Key-sorted data layout with min-max (zone-map) pruned reads.

At 100 TB the cheapest query is the one that never reads the data:
parquet stores per-row-group column statistics, so a table WRITTEN
sorted (or range-partitioned) by a key lets any key-range read skip
whole files and row groups from the footer metadata alone — the same
read-pruning contract as ``read_parquet(columns=...)``, applied to row
ranges (public knowledge: every lakehouse engine's "zone map" /
"data skipping").

- :func:`write_sorted` range-partitions the dataset by key (one
  distributed sort) and writes one parquet file per output block, so
  files carry non-overlapping key ranges and their footers advertise
  them.
- :func:`pruned_read` plans a key-range read from the footers ONLY
  (files, then row groups), returning a Dataset over exactly the
  matching fragments — bytes for every other row group never leave
  storage.  The plan-time file/row-group counts are returned so tests
  (and ops dashboards) can assert real pruning.
"""
from __future__ import annotations

import os
from typing import TYPE_CHECKING, Optional

import pyarrow as pa
import pyarrow.parquet as pq

if TYPE_CHECKING:  # pragma: no cover
    import ray


def write_sorted(
    ds: "ray.data.Dataset",
    path: str,
    key: str,
    target_rows_per_file: int = 250_000,
    row_group_rows: int = 16_384,
) -> int:
    """One distributed sort by ``key`` + streaming write; returns the
    number of files written.  Small row groups sharpen zone-map
    resolution at a small metadata cost (the standard dial)."""
    os.makedirs(path, exist_ok=True)
    n = ds.count()
    n_blocks = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    (
        ds.sort(key)
        .repartition(n_blocks)
        .write_parquet(path, row_group_size=row_group_rows)
    )
    return len(_files(path))


def _files(path: str) -> list[str]:
    out = []
    for root, _d, names in os.walk(path):
        out.extend(os.path.join(root, f) for f in sorted(names) if f.endswith(".parquet"))
    return sorted(out)


def plan_key_range(
    path: str, key: str, lo, hi
) -> tuple[list[tuple[str, list[int]]], dict]:
    """Footer-only planning: returns ``[(file, [row_group_idx, ...])]``
    for row groups whose [min, max] stats intersect ``[lo, hi]``, plus
    pruning counters."""
    plan: list[tuple[str, list[int]]] = []
    total_files = total_rgs = kept_rgs = 0
    for f in _files(path):
        md = pq.ParquetFile(f).metadata
        total_files += 1
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ki = col_idx[key]
        keep: list[int] = []
        for rg in range(md.num_row_groups):
            total_rgs += 1
            st = md.row_group(rg).column(ki).statistics
            if st is None or st.min is None:
                keep.append(rg)  # no stats: cannot prune, must read
                continue
            if st.max < lo or st.min > hi:
                continue
            keep.append(rg)
        kept_rgs += len(keep)
        if keep:
            plan.append((f, keep))
    stats = {
        "files_total": total_files,
        "files_read": len(plan),
        "row_groups_total": total_rgs,
        "row_groups_read": kept_rgs,
    }
    return plan, stats


def pruned_read(
    path: str,
    key: str,
    lo,
    hi,
    columns: Optional[list[str]] = None,
) -> tuple["ray.data.Dataset", dict]:
    """Key-range read over a :func:`write_sorted` layout.

    Plans files + row groups from footers, reads ONLY those fragments
    (one read task per file; the row-group subset is applied inside the
    task via ``pq.ParquetFile.read_row_groups`` — pyarrow decodes only
    the requested groups), then applies the exact residual filter.
    Returns ``(dataset, pruning_stats)``."""
    import ray
    import ray.data

    plan, stats = plan_key_range(path, key, lo, hi)
    if not plan:
        empty = pa.schema([(key, pa.int64())])
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=empty)), stats

    def read_fragments(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tables = []
        for row in batch.to_pylist():
            pf = pq.ParquetFile(row["file"])
            t = pf.read_row_groups(list(row["rgs"]), columns=columns)
            m = pc.and_(pc.greater_equal(t[key], lo), pc.less_equal(t[key], hi))
            tables.append(t.filter(m))
        return pa.concat_tables(tables, promote_options="default")

    items = [{"file": f, "rgs": list(rgs)} for f, rgs in plan]
    # one file per read task — the file list is the parallelism unit,
    # exactly like ray.data.read_parquet's own fragment planning
    out = ray.data.from_items(items).map_batches(
        read_fragments, batch_format="pyarrow", batch_size=1
    )
    return out, stats
