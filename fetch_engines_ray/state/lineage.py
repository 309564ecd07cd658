"""Per-partition lineage records for checkpoint/resume.

North-rule requirement: each output partition records
``(partition_id, input_fragments, row_count, span_hash, wall_time,
route_counts)`` in a sidecar directory next to the output dataset.  On
restart the driver reads the sidecar and filters already-committed
input fragments out of the read plan — a plan-time anti-join, no data
shuffle.  This replaces the reference's TTL result cache
(/root/reference/src/PlaywrightEngine.ts:249-260) as the idempotency
mechanism.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable, Optional

LINEAGE_DIR = "_lineage"


def span_hash_for_doc(doc_id: str, out_spans: Iterable[dict]) -> int:
    """Order-sensitive 64-bit hash of a document's output span sequence."""
    h = hashlib.blake2b(digest_size=8)
    h.update(doc_id.encode())
    for s in out_spans:
        h.update(b"\x00")
        h.update(str(s.get("kind", "")).encode())
        h.update(b"\x01")
        h.update(str(s.get("text", "")).encode())
        h.update(b"\x02")
        h.update(str(s.get("media_ref", "")).encode())
        h.update(b"\x03")
        h.update(str(s.get("order", "")).encode())
    return int.from_bytes(h.digest(), "big")


def combine_hashes(hashes: Iterable[int]) -> int:
    """Order-insensitive combination (xor) across a partition's docs."""
    acc = 0
    for v in hashes:
        acc ^= v
    return acc


def lineage_path(output_dir: str, partition_id: str) -> str:
    return os.path.join(output_dir, LINEAGE_DIR, f"{partition_id}.json")


def write_lineage(
    output_dir: str,
    partition_id: str,
    input_fragments: list[str],
    row_count: int,
    span_hash: int,
    wall_time: float,
    route_counts: Optional[dict] = None,
) -> None:
    """Atomic (tmp+rename) lineage commit — written only after the
    partition's output part file has been fully written."""
    d = os.path.join(output_dir, LINEAGE_DIR)
    os.makedirs(d, exist_ok=True)
    record = {
        "partition_id": partition_id,
        "input_fragments": input_fragments,
        "row_count": row_count,
        "span_hash": f"{span_hash:016x}",
        "wall_time": wall_time,
        "route_counts": route_counts or {},
    }
    tmp = os.path.join(d, f".{partition_id}.tmp")
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, lineage_path(output_dir, partition_id))


def read_lineage(output_dir: str) -> dict[str, dict]:
    """All committed lineage records, keyed by partition_id."""
    d = os.path.join(output_dir, LINEAGE_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[rec["partition_id"]] = rec
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # half-written records are simply redone
    return out


def completed_fragments(output_dir: str) -> set[str]:
    done: set[str] = set()
    for rec in read_lineage(output_dir).values():
        done.update(rec.get("input_fragments", ()))
    return done
