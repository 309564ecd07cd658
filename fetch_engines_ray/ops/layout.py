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
    resolution at a small metadata cost (the standard dial).

    Refuses a destination that already holds parquet files:
    ``write_parquet`` appends uniquely-named files, so writing over a
    previous layout would silently mix stale rows into every consumer
    (range plans, pruned reads, merge joins) and break the
    non-overlapping-key-range invariant the module is built on.  Write
    a new run dir and compact (:func:`compact_sorted_runs`) instead."""
    if os.path.isdir(path) and _files(path):
        raise ValueError(
            f"sorted-layout path {path!r} already contains parquet files — "
            "write to a fresh directory (compact runs instead of overwriting)"
        )
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
        # empty result typed from the LAYOUT'S OWN footer schema (and
        # projected to the requested columns) — a hardcoded {key: int64}
        # stub broke unions with non-empty reads and column selection
        # exactly and only in the empty-range case
        files = _files(path)
        if files:
            schema = pq.read_schema(files[0]).remove_metadata()
            if columns is not None:
                schema = pa.schema([schema.field(c) for c in columns])
        else:
            schema = pa.schema([(key, pa.int64())])
        return ray.data.from_arrow(schema.empty_table()), stats

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


def _rg_entries(paths: list[str], key: str) -> list[tuple]:
    """(min, max, n_rows) per row group across every layout in
    ``paths`` — footer metadata only, nothing row-scaled."""
    entries = []
    for rp in paths:
        for f in _files(rp):
            md = pq.ParquetFile(f).metadata
            col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ki = col_idx[key]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ki).statistics
                if st is None or st.min is None:
                    raise ValueError(
                        f"{f} row group {rg} lacks {key} statistics — "
                        "zone-map ops need stats (write via write_sorted)"
                    )
                entries.append((st.min, st.max, md.row_group(rg).num_rows))
    return entries


def _cut_buckets(entries: list[tuple], target_rows: int) -> list[dict]:
    """Row-balanced key-space buckets from sorted row-group entries;
    (lo inclusive, hi exclusive), None = unbounded."""
    entries = sorted(entries, key=lambda e: (e[0], e[1]))
    cuts = []
    acc = 0
    for mn, _mx, rows in entries:
        if acc >= target_rows:
            cuts.append(mn)
            acc = 0
        acc += rows
    bounds = [None] + cuts + [None]
    return [
        {"i": i, "lo": bounds[i], "hi": bounds[i + 1]}
        for i in range(len(bounds) - 1)
    ]


def merge_join_sorted(
    left_path: str,
    right_path: str,
    key: str,
    how: str = "inner",
    columns_left: Optional[list[str]] = None,
    columns_right: Optional[list[str]] = None,
    target_rows_per_bucket: int = 250_000,
    suffixes: tuple = ("", "_right"),
) -> tuple["ray.data.Dataset", dict]:
    """JOIN WITHOUT A SHUFFLE over two key-sorted layouts.

    Ray Data's native ``join`` is an all-to-all hash exchange — correct
    for arbitrary inputs, but when BOTH sides are already
    :func:`write_sorted` by the join key (the lakehouse норm for a
    primary key), the exchange is pure waste: every key lives in a
    known file/row-group range on both sides.  This operator is the
    storage-level merge join: the driver cuts the key space into
    row-balanced buckets from the two layouts' FOOTERS alone, and each
    bucket is one Ray task that footer-plan-reads its slice from each
    side (:func:`plan_key_range` — non-matching row groups never leave
    storage) and joins locally with one C-level pandas merge.  Keys
    cannot straddle buckets (disjoint [lo, hi) ranges with exact
    residual filters), so the per-bucket joins concatenate to the
    exact global join — zero exchange, zero driver data.

    ``how``: inner / left / outer (pandas semantics on the bucket —
    valid globally because bucket ranges partition BOTH key spaces).
    Returns ``(dataset, stats)``; stats carry bucket count and total
    footer row groups per side.
    """
    import ray
    import ray.data

    if how not in ("inner", "left", "outer"):
        raise ValueError(f"unsupported how: {how!r} (inner|left|outer)")
    left_entries = _rg_entries([left_path], key)
    right_entries = _rg_entries([right_path], key)
    if not left_entries:
        raise ValueError(f"no parquet row groups under {left_path}")
    buckets = _cut_buckets(left_entries + right_entries, target_rows_per_bucket)
    all_entries = left_entries + right_entries
    gmin = min(e[0] for e in all_entries)
    gmax = max(e[1] for e in all_entries)

    if columns_left is not None and key not in columns_left:
        columns_left = [key] + list(columns_left)
    if columns_right is not None and key not in columns_right:
        columns_right = [key] + list(columns_right)

    def _read_side(path, cols, lo, hi):
        import pyarrow.compute as pc

        plan, _ = plan_key_range(
            path, key, lo if lo is not None else gmin, hi if hi is not None else gmax
        )
        tables = []
        for f, rgs in plan:
            t = pq.ParquetFile(f).read_row_groups(list(rgs), columns=cols)
            m = pa.array([True] * t.num_rows)
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(t[key], lo))
            if hi is not None:
                m = pc.and_(m, pc.less(t[key], hi))
            tables.append(t.filter(m))
        if not tables:
            # typed empty from the layout's own schema
            first = _files(path)[0]
            return pq.ParquetFile(first).schema_arrow.empty_table().select(
                cols or pq.ParquetFile(first).schema_arrow.names
            )
        return pa.concat_tables(tables, promote_options="default")

    def join_bucket(batch: pa.Table) -> "pa.Table":
        import pandas as pd  # noqa: F401  (pandas merge is the kernel)

        out = []
        for spec in batch.to_pylist():
            lo, hi = spec["lo"], spec["hi"]
            lt = _read_side(left_path, columns_left, lo, hi).to_pandas()
            rt = _read_side(right_path, columns_right, lo, hi).to_pandas()
            out.append(lt.merge(rt, on=key, how=how, suffixes=suffixes))
        import pandas as pd

        return pa.Table.from_pandas(
            pd.concat(out, ignore_index=True), preserve_index=False
        )

    ds = ray.data.from_items(
        [{"i": b["i"], "lo": b["lo"], "hi": b["hi"]} for b in buckets]
    ).map_batches(join_bucket, batch_format="pyarrow", batch_size=1)
    stats = {
        "buckets": len(buckets),
        "left_row_groups": len(left_entries),
        "right_row_groups": len(right_entries),
    }
    return ds, stats


def compact_sorted_runs(
    run_paths: list[str],
    out_path: str,
    key: str,
    target_rows_per_file: int = 250_000,
    row_group_rows: int = 16_384,
) -> dict:
    """Merge several :func:`write_sorted` runs into ONE sorted layout
    WITHOUT a global shuffle — the LSM-style compaction a continuously
    ingested corpus needs (each crawl increment lands as its own sorted
    run; queries degrade as runs pile up; compaction restores the
    single-layout pruning contract).

    Scale shape: the driver reads ONLY footers (one (min, max, rows)
    triple per row group across all runs) and cuts the key space into
    row-balanced buckets; each bucket is one Ray task that range-reads
    its slice from every run via the same footer-planned row-group
    pruning as :func:`pruned_read`, merges + sorts locally (bucket ≈
    ``target_rows_per_file`` rows, a worker-heap-sized unit), and
    writes one output file tmp+rename — so a killed compaction resumes
    by skipping already-written buckets.  Output files carry
    non-overlapping key ranges by construction.
    """
    import ray
    import ray.data

    os.makedirs(out_path, exist_ok=True)
    entries = _rg_entries(list(run_paths), key)
    if not entries:
        return {"buckets": 0, "rows": 0, "files": 0}
    entries.sort(key=lambda e: (e[0], e[1]))
    total_rows = sum(e[2] for e in entries)

    # bucket boundaries at row-group minima, cut when the running row
    # count passes the target (approximate by one row group — fine)
    buckets = _cut_buckets(entries, target_rows_per_file)

    runs = list(run_paths)
    gmin = entries[0][0]
    gmax = max(e[1] for e in entries)

    def compact_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_rows = []
        for spec in batch.to_pylist():
            i, lo, hi = spec["i"], spec["lo"], spec["hi"]
            dest = os.path.join(out_path, f"part-{i:05d}.parquet")
            if os.path.exists(dest):
                out_rows.append({"bucket": i, "rows": -1, "skipped": True})
                continue
            tables = []
            # plan with inclusive bounds typed like the key (no float
            # infinities — string keys must compare); the residual
            # filter below applies the exclusive hi
            plan_lo = lo if lo is not None else gmin
            plan_hi = hi if hi is not None else gmax
            for rp in runs:
                plan, _ = plan_key_range(rp, key, plan_lo, plan_hi)
                for f, rgs in plan:
                    t = pq.ParquetFile(f).read_row_groups(list(rgs))
                    m = pa.array([True] * t.num_rows)
                    if lo is not None:
                        m = pc.and_(m, pc.greater_equal(t[key], lo))
                    if hi is not None:
                        m = pc.and_(m, pc.less(t[key], hi))
                    tables.append(t.filter(m))
            merged = pa.concat_tables(tables, promote_options="default")
            merged = merged.sort_by([(key, "ascending")])
            tmp = dest + ".tmp"
            pq.write_table(merged, tmp, row_group_size=row_group_rows)
            os.replace(tmp, dest)
            out_rows.append({"bucket": i, "rows": merged.num_rows, "skipped": False})
        return pa.Table.from_pylist(
            out_rows,
            schema=pa.schema(
                [("bucket", pa.int64()), ("rows", pa.int64()), ("skipped", pa.bool_())]
            ),
        )

    report = (
        ray.data.from_items(buckets)
        .map_batches(compact_bucket, batch_format="pyarrow", batch_size=1)
        .to_pandas()  # bucket-count-sized
    )
    done = report[~report["skipped"]]
    return {
        "buckets": int(len(report)),
        "skipped_buckets": int(report["skipped"].sum()),
        "rows": int(done["rows"].sum()),
        "files": len(_files(out_path)),
        "input_rows": total_rows,
    }
