"""Engine metrics readout (reference ``IEngine.getMetrics()`` analog).

The reference exposes per-browser pool metrics — ``BrowserMetrics``
(/root/reference/src/types.ts:46-57: pages open, active/idle, errors,
createdAt/lastUsed) via ``IEngine.getMetrics()``
(/root/reference/src/IEngine.ts:6-32).  The Ray-Data-native analog has
three layers:

* **per-stage**: executed-dataset operator stats (wall time, CPU time,
  rows, bytes, node count) pulled from Ray Data's stats summary;
* **per-run**: the lineage records the resumable runner writes
  (partitions, rows, per-route counts, wall time per partition);
* **cluster**: resource totals/availability — the pool-health analog.

Everything returned is plain dicts so callers can JSON-dump a metrics
report next to the eval report (S7).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import ray


def stage_metrics(ds) -> list[dict[str, Any]]:
    """Per-operator metrics for an EXECUTED Dataset (call after
    ``materialize()``/``write_*``/consumption — a lazy plan has no
    stats).  Falls back to an empty list if Ray's (internal) stats
    summary shape changes."""
    try:
        summary = ds._plan.stats().to_summary()
    except Exception:
        return []
    out = []
    for op in getattr(summary, "operators_stats", []) or []:
        wall = getattr(op, "wall_time", None) or {}
        cpu = getattr(op, "cpu_time", None) or {}
        rows = getattr(op, "output_num_rows", None) or {}
        nodes = getattr(op, "node_count", None) or {}
        out.append(
            {
                "operator": getattr(op, "operator_name", "?"),
                "wall_time_s": round(float(wall.get("sum", 0.0) or 0.0), 4),
                "cpu_time_s": round(float(cpu.get("sum", 0.0) or 0.0), 4),
                "output_rows": int(rows.get("sum", 0) or 0),
                "node_count": int(nodes.get("count", 0) or 0),
            }
        )
    return out


def cluster_metrics() -> dict[str, Any]:
    """Pool-health analog: cluster resource totals vs availability and
    object-store usage."""
    if not ray.is_initialized():
        return {}
    total = ray.cluster_resources()
    avail = ray.available_resources()
    return {
        "cpus_total": int(total.get("CPU", 0)),
        "cpus_available": round(float(avail.get("CPU", 0.0)), 1),
        "object_store_bytes_total": int(total.get("object_store_memory", 0)),
        "object_store_bytes_available": int(avail.get("object_store_memory", 0)),
        "nodes": len([n for n in ray.nodes() if n.get("Alive")]),
    }


def lineage_metrics(output_dir: str) -> dict[str, Any]:
    """Aggregate the resumable runner's lineage records (per-partition
    rows / wall time / route counts) into one run-level summary."""
    from . import lineage as lin

    records = list(lin.read_lineage(output_dir).values())
    if not records:
        return {"partitions": 0, "rows": 0}
    rows = sum(r.get("row_count", 0) for r in records)
    wall = sum(r.get("wall_time", 0.0) for r in records)
    routes: dict[str, int] = {}
    for r in records:
        for k, v in (r.get("route_counts") or {}).items():
            routes[k] = routes.get(k, 0) + v
    return {
        "partitions": len(records),
        "rows": rows,
        "wall_time_s_total": round(wall, 3),
        "docs_per_sec_per_worker": round(rows / wall, 1) if wall else None,
        "route_counts": routes,
    }


def get_metrics(
    ds=None, lineage_dir: Optional[str] = None
) -> dict[str, Any]:
    """One-call engine metrics snapshot (the ``getMetrics()`` surface):
    any subset of stage/lineage inputs may be provided."""
    report: dict[str, Any] = {"cluster": cluster_metrics()}
    if ds is not None:
        report["stages"] = stage_metrics(ds)
    if lineage_dir and os.path.isdir(lineage_dir):
        report["lineage"] = lineage_metrics(lineage_dir)
    return report
