"""Sharded JSONL delivery: the interchange export every LLM-training
stack ingests (Megatron/NeMo/lit-gpt style ``.jsonl`` / ``.jsonl.gz``
shard directories).

Mirrors the binary token-shard exporter's contract
(:func:`binshard.write_token_shards`): deterministic seeded shard +
within-shard shuffle via :func:`partitioning.assign_shards`, one task
per shard, tmp+rename atomicity, and RESUME — a re-run skips any shard
whose ``.meta.json`` sidecar already exists, so a killed 100-TB export
never rewrites finished files.  Row bytes never transit the driver;
the driver only sees the one-row-per-shard manifest.

Scale shape: ONE ``groupby(shard).map_groups`` (the only all-to-all),
serialization is pandas' C-level ``to_json(lines=True)`` per shard.
Size ``n_shards`` so a shard fits a worker's heap (it is the atomic
resume unit, same guidance as the token shards).  Binary (media)
columns are out of scope by design — JSONL is the text/metadata
delivery; media rides the parquet / token-shard exporters.
"""

from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa

import ray.data

_FORMAT = "fer-jsonl-shards"
_VERSION = 1


def _shard_paths(path: str, shard: int, compression: str | None) -> tuple[str, str]:
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"
    return (
        os.path.join(path, f"shard_{shard:05d}{ext}"),
        os.path.join(path, f"shard_{shard:05d}.meta.json"),
    )


def write_jsonl_shards(
    ds: "ray.data.Dataset",
    path: str,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
    compression: str | None = None,
) -> dict:
    """Seeded-shuffle sharded JSONL export, atomic and resumable.

    Every input column is serialized (timestamps as ISO-8601); rows
    within a shard are ordered by the seeded ``shuffle_key`` so the
    delivery is a reproducible global shuffle — identical across runs,
    machines and partitionings.  ``compression="gzip"`` writes
    ``.jsonl.gz`` with a zeroed mtime header so shard BYTES are also
    reproducible.  Returns a manifest dict (per-shard row counts,
    skipped count, path).
    """
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    from .partitioning import assign_shards

    os.makedirs(path, exist_ok=True)
    # resume is per-shard (meta file presence), so the delivery CONFIG
    # must match what the directory was written with — resuming with a
    # different n_shards/seed would silently skip stale mod-old-N
    # shards, duplicate rows against fresh ones, and leave orphan files
    # that read_jsonl_shards globs up
    import glob as _glob

    # id_col is part of the config: assign_shards keys the shard
    # assignment on it, so resuming with a DIFFERENT id column lands
    # rows on different shards — the exact mixed stale/fresh delivery
    # this guard exists to refuse.  (Metas written before id_col was
    # recorded compare as None and are refused too — a fresh dir is the
    # safe answer for those.)
    cfg = {
        "n_shards": int(n_shards),
        "seed": int(seed),
        "compression": compression,
        "id_col": id_col,
    }
    for m in sorted(_glob.glob(os.path.join(path, "*.meta.json"))):
        with open(m) as f:
            recorded = json.load(f)
        rec_cfg = {k: recorded.get(k) for k in cfg}
        if rec_cfg != cfg:
            raise ValueError(
                f"delivery dir {path!r} was written with {rec_cfg}, this run "
                f"asks {cfg} — use a fresh directory (a config change makes "
                "per-shard resume produce a corrupt mixed delivery)"
            )
        break  # one meta is enough; all shards share the run config
    sharded = assign_shards(ds, n_shards, seed=seed, id_col=id_col)

    def write_shard(group) -> pa.Table:
        import pandas as pd

        df = group if isinstance(group, pd.DataFrame) else group.to_pandas()
        df = df.sort_values("shuffle_key")
        shard = int(df["shard"].iloc[0])
        data_path, meta_path = _shard_paths(path, shard, compression)
        if os.path.exists(meta_path):  # resume: shard already delivered
            with open(meta_path) as f:
                meta = json.load(f)
            return pa.table(
                {
                    "shard": pa.array([shard], type=pa.int64()),
                    "n_rows": pa.array([meta["n_rows"]], type=pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        body = df.drop(columns=["shard", "shuffle_key"])
        payload = body.to_json(
            orient="records", lines=True, date_format="iso", force_ascii=False
        ).encode("utf-8")
        if len(body) and not payload.endswith(b"\n"):
            payload += b"\n"
        tmp = data_path + ".tmp"
        if compression == "gzip":
            with open(tmp, "wb") as raw, gzip.GzipFile(
                fileobj=raw, mode="wb", mtime=0
            ) as gz:
                gz.write(payload)
        else:
            with open(tmp, "wb") as f:
                f.write(payload)
        os.replace(tmp, data_path)
        meta = {
            "format": _FORMAT,
            "version": _VERSION,
            "compression": compression,
            "n_shards": int(n_shards),
            "seed": int(seed),
            "id_col": id_col,
            "n_rows": int(len(body)),
            "columns": list(body.columns),
        }
        tmp_meta = meta_path + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, meta_path)
        return pa.table(
            {
                "shard": pa.array([shard], type=pa.int64()),
                "n_rows": pa.array([meta["n_rows"]], type=pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    manifest = (
        sharded.groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()  # bounded: one row per shard
    )
    if manifest.empty or "shard" not in manifest.columns:
        # empty input (every upstream row filtered): a valid, zero-shard
        # delivery — not a crash
        return {
            "path": path,
            "compression": compression,
            "n_shards": 0,
            "n_rows": 0,
            "skipped_shards": 0,
        }
    manifest = manifest.sort_values("shard").reset_index(drop=True)
    return {
        "path": path,
        "compression": compression,
        "n_shards": int(len(manifest)),
        "n_rows": int(manifest["n_rows"].sum()),
        "skipped_shards": int(manifest["skipped"].sum()),
    }


def read_jsonl_shards(path: str) -> "ray.data.Dataset":
    """Distributed read-back: one task per shard file parses its own
    lines (plain or gzip) — file bytes never transit the driver."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".jsonl") or f.endswith(".jsonl.gz")
    )
    paths = ray.data.from_items([{"file": f} for f in files])

    def load(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for fp in batch["file"].to_pylist():
            opener = gzip.open if fp.endswith(".gz") else open
            with opener(fp, "rt", encoding="utf-8") as f:
                for line in f:
                    if line.strip():
                        rows.append(json.loads(line))
        if not rows:
            return pa.table({})
        return pa.Table.from_pylist(rows)

    return paths.map_batches(load, batch_format="pyarrow", batch_size=1)
