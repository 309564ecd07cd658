"""The flagship extraction pipeline, Ray-Data-first.

Two entry points:

* :func:`build_pipeline` — pure streaming ``Dataset`` transform
  (read → actor-pool ``map_batches`` extraction).  Used by
  ``__ray_entry__.entry()``/``queries()`` and by ``bench.py``.
* :func:`run_resumable` — partition-atomic runner with per-partition
  lineage records and plan-time resume (north rule: checkpoint resume
  at 10^12-doc scale).  One input parquet fragment → one output part
  file + one lineage record; a killed run re-processes only
  uncommitted fragments.

Scale notes (sized for a 256-node cluster, tested on one node):

* extraction is an **actor pool** (``concurrency=N``) because each
  actor holds compiled converter state — not because of Python-level
  state mutation; batches stay Arrow end-to-end.
* ``batch_size`` is small (default 16) so one mega-page cannot stall a
  thousand-row batch (skew control, SURVEY.md §4.2); Ray Data's
  dynamic block splitting handles oversized *outputs*.
* no stage materializes the dataset; the streaming executor pipelines
  read → extract → write with backpressure.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional, Union

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from fetch_engines_ray.arrowclean import read_parquet_clean

from ..stages.extract import (
    OUTPUT_SCHEMA,
    DocumentExtractor,
    WarmExtractor,
    extract_fast_batch,
    warm_extract_batch,
)
from ..state import lineage as lin


@dataclass
class PipelineConfig:
    """Engine knobs (reference analog: the 20+ config surface at
    /root/reference/src/types.ts:75-216)."""

    # Fast task-pool stage batch size (64 measured best at 32 CPUs —
    # enough tasks for load balance, small enough that a mega-page
    # can't stall many docs behind it).
    batch_size: int = 64
    # Warm actor-pool stage batch size (smaller: one JS-shell/PDF doc
    # must not stall a fat batch — skew control, SURVEY.md §4.2).
    warm_batch_size: int = 64
    # Warm actor pool bounds.  int = fixed pool; (min, max) tuple =
    # autoscaling.  Never size any actor pool to ALL cluster CPUs: the
    # read/write task operators need CPU headroom or the streaming
    # executor starves (observed as a full-pipeline stall at
    # concurrency == num_cpus).
    concurrency: Union[int, tuple] = (1, 8)
    num_cpus_per_actor: float = 1.0
    # False (default): warm stage is a task function with per-worker
    # cached state — it fuses with the fast stage into ONE task-pool
    # operator that self-schedules across all CPUs.  True: warm stage
    # is a WarmExtractor actor pool (use when warm state is expensive
    # to build, e.g. a real PDF layout model); note operator fusion
    # then pins the fused fast+warm work to the pool, so size
    # `concurrency` accordingly.
    use_actor_warm_stage: bool = False
    # C10 route overrides (reference playwrightOnlyPatterns,
    # /root/reference/src/HybridEngine.ts:160-170): entries are plain
    # URL substrings OR compiled re.Pattern objects (the reference's
    # `(string | RegExp)[]` contract) that force the warm path.  Per-row
    # overrides ride in an optional `force_route` input column.
    warm_url_patterns: tuple = ()
    max_content_length: Optional[int] = None
    read_columns: tuple = ("doc_id", "spans", "archetype", "base_url")
    # A3 pool-health analog: extra ray remote args for the warm actor
    # pool (e.g. {"max_restarts": -1, "max_task_retries": -1} lets Ray
    # replace a crashed actor and re-run its in-flight batches — the
    # reference's pool health-check/recycle loop re-expressed as Ray
    # actor supervision).  Only used with use_actor_warm_stage=True.
    actor_ray_remote_args: Optional[dict] = None


def safe_pool_size(num_cpus: Optional[int] = None, headroom: int = 2) -> tuple:
    """Autoscaling actor-pool bounds that leave ``headroom`` CPUs for the
    read/write task operators (full-CPU pools starve them)."""
    if num_cpus is None:
        num_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(2, int(num_cpus) - headroom)
    return (min(2, cap), cap)


def read_corpus(path: str, cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    return read_parquet_clean(path, columns=list(cfg.read_columns))


def build_pipeline(ds: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    """Attach the extraction stages to a corpus Dataset (lazy).

    One linear stream, no branch re-execution:
      fast stage (stateless task pool — fully extracts "fast"-routed
      docs, passes "warm" docs through with raw spans) →
      warm stage (actor pool holding hydration/PDF-layout state —
      touches only the warm fraction, Arrow-slice passthrough for the
      rest).
    """
    cfg = cfg or PipelineConfig()
    fast = ds.map_batches(
        extract_fast_batch,
        fn_kwargs={
            "max_content_length": cfg.max_content_length,
            "warm_url_patterns": cfg.warm_url_patterns,
        },
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    if cfg.use_actor_warm_stage:
        return fast.map_batches(
            WarmExtractor,
            fn_constructor_kwargs={"max_content_length": cfg.max_content_length},
            batch_format="pyarrow",
            batch_size=cfg.warm_batch_size,
            concurrency=cfg.concurrency,
            num_cpus=cfg.num_cpus_per_actor,
            **(cfg.actor_ray_remote_args or {}),
        )
    return fast.map_batches(
        warm_extract_batch,
        fn_kwargs={"max_content_length": cfg.max_content_length},
        batch_format="pyarrow",
        batch_size=cfg.warm_batch_size,
    )


def extract_corpus(input_path: str, cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    return build_pipeline(read_corpus(input_path, cfg), cfg)


def _content_view(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Collapse each corpus row to ``(doc_id, text)`` where text is a
    canonical serialization of everything extraction consumes (spans +
    archetype + base_url) — the change-detection key for refresh."""

    def view(batch: pa.Table) -> pa.Table:
        texts = []
        for spans, arch, base in zip(
            batch["spans"].to_pylist(),
            batch["archetype"].to_pylist(),
            batch["base_url"].to_pylist(),
        ):
            parts = [f"{arch or ''}\x1f{base or ''}"]
            for s in spans or []:
                parts.append(
                    f"{s.get('kind') or ''}\x1f{s.get('text') or ''}\x1f{s.get('media_ref') or ''}"
                )
            texts.append("\x1e".join(parts))
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(texts, type=pa.string())}
        )

    return ds.map_batches(view, batch_format="pyarrow", batch_size=1024)


def refresh_extract(
    prev_corpus_path: str,
    new_corpus_path: str,
    prev_output: "ray.data.Dataset",
    cfg: Optional[PipelineConfig] = None,
    churn_broadcast_limit: int = 2_000_000,
) -> tuple["ray.data.Dataset", dict]:
    """Incremental re-crawl refresh: extract ONLY the pages whose
    content actually changed, reuse the previous run's output for
    everything else — extraction is the expensive stage, and week-over-
    week crawl churn is a small fraction of the corpus.

    Mechanics: both corpora collapse to (id, content-hash) views and
    diff via ``ops.diff.corpus_diff`` (output is CHURN-sized — only
    added/changed/removed rows, spilled once so the count is
    metadata-only); below ``churn_broadcast_limit`` the added∪changed
    id set broadcasts into a filter over the new corpus, which alone
    flows through the extraction pipeline, and removed∪changed ids
    drop from the previous output — zero shuffle, the healthy
    week-over-week shape.  ABOVE the limit (a degenerate high-churn /
    full re-crawl input, where the old broadcast degraded to a
    corpus-sized ray.put) the churn table stays a Dataset and both
    filters become distributed hash joins — the id sets never ride the
    driver, at the cost of shuffling the (mostly re-extracted anyway)
    corpus through the join.

    Returns ``(dataset, stats)`` with stats counting added / changed /
    removed / reused.  On the high-churn path stats also carries
    ``churn_spill`` — the checkpoint directory the returned lazy chain
    streams from; remove it (``ops.dedup._cleanup_checkpoint``) after
    consuming the output."""
    import pyarrow.compute as pc

    import ray

    from ..ops.diff import corpus_diff

    from ..ops.dedup import _checkpoint_parquet, _cleanup_checkpoint, filter_by_keys

    cfg = cfg or PipelineConfig()
    old_view = _content_view(read_corpus(prev_corpus_path, cfg))
    new_view = _content_view(read_corpus(new_corpus_path, cfg))
    # spill the churn table once: the count below is then
    # metadata-only, and in the high-churn regime BOTH join sides
    # stream it back without re-running the diff shuffle
    churn_ds, _churn_ckpt = _checkpoint_parquet(
        corpus_diff(old_view, new_view), "refresh_churn"
    )
    n_churn = churn_ds.count()

    if n_churn > churn_broadcast_limit:
        # distributed handoff: churn ids never land on the driver.
        # Per-status counts are the only driver-side values (3 rows).
        # (groupby().count() names its column "count()" or "count"
        # depending on Ray version — same shim as ops/textstats.)
        _cnt_rows = churn_ds.groupby("status").count().take_all()
        _cnt_col = "count()" if _cnt_rows and "count()" in _cnt_rows[0] else "count"
        by_status = {r["status"]: int(r[_cnt_col]) for r in _cnt_rows}
        n_added = by_status.get("added", 0)
        n_changed = by_status.get("changed", 0)
        n_removed = by_status.get("removed", 0)
        n_todo = n_added + n_changed
        # part count sized from the CORPUS (parquet metadata — free):
        # the filter's groups carry the corpus side, not just the churn
        n_parts = max(
            2, min(64, read_corpus(new_corpus_path, cfg).count() // 200_000 + 1)
        )
        # filter_by_keys, not Dataset.join: Ray's hash-join aggregator
        # dies on schema-less empty partitions whenever one side is
        # sparse (reproduced right here by the forced-join pytest), and
        # the span payload columns must ride through as Arrow anyway
        if n_todo:
            todo_ds = churn_ds.filter(expr="status != 'removed'").select_columns(
                ["doc_id"]
            )
            fresh = build_pipeline(
                filter_by_keys(
                    read_corpus(new_corpus_path, cfg),
                    todo_ds,
                    "doc_id",
                    keep_matches=True,
                    n_parts=n_parts,
                ),
                cfg,
            )
        # every churn row is stale for the previous output
        reused = filter_by_keys(
            prev_output,
            churn_ds.select_columns(["doc_id"]),
            "doc_id",
            keep_matches=False,
            n_parts=n_parts,
        )
        out = reused.union(fresh) if n_todo else reused
        # the returned lazy chain still streams the churn spill, so it
        # cannot be deleted here (same posture as curate's tokenizer
        # checkpoints); its path rides in stats for the caller to
        # remove after consuming the output — without this, repeated
        # high-churn refreshes would accumulate churn-sized spills
        # under FER_CHECKPOINT_DIR
        return out, {
            "added": n_added,
            "changed": n_changed,
            "removed": n_removed,
            "reextracted": n_todo,
            "churn_spill": _churn_ckpt,
        }

    churn = churn_ds.to_pandas() if n_churn else None  # churn-sized
    _cleanup_checkpoint(_churn_ckpt)  # driver path: fully consumed
    # zero churn yields a COLUMN-LESS empty frame (Ray's schema-less
    # empty-dataset shape) — treat as the no-op it is
    by = (
        churn.groupby("status")["doc_id"].apply(list).to_dict()
        if churn is not None
        else {}
    )
    added = set(by.get("added", ()))
    changed = set(by.get("changed", ()))
    removed = set(by.get("removed", ()))
    todo = added | changed
    stale = todo | removed

    todo_ref = ray.put(todo)
    stale_ref = ray.put(stale)

    def only_todo(batch: pa.Table) -> pa.Table:
        want = ray.get(todo_ref)
        if not want:
            return batch.slice(0, 0)
        arr = pa.array(list(want)).cast(batch["doc_id"].type)
        return batch.filter(pc.is_in(batch["doc_id"], value_set=arr))

    def drop_stale(batch: pa.Table) -> pa.Table:
        bad = ray.get(stale_ref)
        if not bad:
            return batch
        arr = pa.array(list(bad)).cast(batch["doc_id"].type)
        return batch.filter(pc.invert(pc.is_in(batch["doc_id"], value_set=arr)))

    fresh = build_pipeline(
        read_corpus(new_corpus_path, cfg).map_batches(
            only_todo, batch_format="pyarrow", batch_size=1024
        ),
        cfg,
    )
    reused = prev_output.map_batches(
        drop_stale, batch_format="pyarrow", batch_size=4096
    )
    out = reused.union(fresh) if todo else reused
    stats = {
        "added": len(added),
        "changed": len(changed),
        "removed": len(removed),
        "reextracted": len(todo),
    }
    return out, stats


# ---------------------------------------------------------------------------
# Resumable partition-atomic runner
# ---------------------------------------------------------------------------

def _list_fragments(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


class _FragmentProcessor:
    """Actor that processes whole input fragments: read fragment →
    extract → atomic write of output part + lineage record.

    Used only by the resumable runner; partition-atomicity is the point
    (a mid-run kill loses at most in-flight fragments)."""

    def __init__(
        self,
        output_dir: str,
        max_content_length: Optional[int] = None,
        warm_url_patterns: tuple = (),
    ) -> None:
        self.output_dir = output_dir
        # the resumable path must route IDENTICALLY to the two-stage
        # pipeline ("resume equals rerun"): C10 pattern overrides ride
        # into the extractor, and a force_route column is read below
        self.extractor = DocumentExtractor(
            max_content_length=max_content_length,
            warm_url_patterns=warm_url_patterns,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = []
        for frag in batch.column("fragment").to_pylist():
            t0 = time.perf_counter()
            part_id = os.path.splitext(os.path.basename(frag))[0]
            cols = ["doc_id", "spans", "archetype", "base_url"]
            if "force_route" in pq.read_schema(frag).names:
                cols.append("force_route")
            table = pq.read_table(frag, columns=cols)
            out_batches = [
                self.extractor(table.slice(off, 256))
                for off in range(0, table.num_rows, 256)
            ]
            out = pa.concat_tables(out_batches) if out_batches else pa.Table.from_pylist([], schema=OUTPUT_SCHEMA)

            os.makedirs(self.output_dir, exist_ok=True)
            final = os.path.join(self.output_dir, f"{part_id}.out.parquet")
            tmp = os.path.join(self.output_dir, f".{part_id}.out.tmp.parquet")
            pq.write_table(out, tmp)
            os.replace(tmp, final)

            doc_hashes = [
                lin.span_hash_for_doc(d, s)
                for d, s in zip(out.column("doc_id").to_pylist(), out.column("out_spans").to_pylist())
            ]
            routes = out.column("route").to_pylist()
            route_counts: dict[str, int] = {}
            for r in routes:
                route_counts[r] = route_counts.get(r, 0) + 1
            lin.write_lineage(
                self.output_dir,
                part_id,
                [frag],
                out.num_rows,
                lin.combine_hashes(doc_hashes),
                time.perf_counter() - t0,
                route_counts,
            )
            results.append({"partition_id": part_id, "rows": out.num_rows})
        return pa.Table.from_pylist(
            results,
            schema=pa.schema([("partition_id", pa.string()), ("rows", pa.int64())]),
        )


def run_resumable(
    input_path: str,
    output_dir: str,
    cfg: Optional[PipelineConfig] = None,
    concurrency: int = 8,
) -> dict:
    """Process all not-yet-committed input fragments; skip finished ones.

    Returns ``{"processed": n, "skipped": m, "rows": total}``.
    """
    cfg = cfg or PipelineConfig()
    fragments = _list_fragments(input_path)
    done = lin.completed_fragments(output_dir)
    todo = [f for f in fragments if f not in done]
    if not todo:
        return {"processed": 0, "skipped": len(fragments), "rows": 0}

    ds = ray.data.from_items([{"fragment": f} for f in todo])
    results = ds.map_batches(
        _FragmentProcessor,
        fn_constructor_kwargs={
            "output_dir": output_dir,
            "max_content_length": cfg.max_content_length,
            "warm_url_patterns": tuple(cfg.warm_url_patterns),
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=min(concurrency, len(todo)),
        num_cpus=1,
    ).take_all()
    rows = sum(r["rows"] for r in results)
    return {"processed": len(todo), "skipped": len(fragments) - len(todo), "rows": rows}


def escalate_low_quality(
    input_path: str,
    extracted: "ray.data.Dataset",
    cfg: Optional[PipelineConfig] = None,
    min_quality: int = 3,
) -> "ray.data.Dataset":
    """Second-pass escalation (reference analog: the retry ladder's
    mode escalation, /root/reference/src/PlaywrightEngine.ts:746-794 —
    re-fetch with a heavier engine when the fast result is poor).

    Docs whose fast extraction scored below ``min_quality`` are re-run
    through the warm path (forced route).  The low-quality ids stay a
    DATASET and the corpus re-read semi-joins against them through
    ``ops/dedup.filter_by_keys`` — no driver-side id set at any
    fraction, no Ray hash join (its aggregator dies on schema-less
    empty partitions whenever the low-quality side is sparse, the
    NORMAL healthy-corpus case), and the nested ``spans`` column rides
    through as Arrow (the former pickle pack/unpack existed only
    because Arrow hash joins reject list payloads).  Returns the
    re-extracted rows (union with the kept rows is the caller's
    choice).
    """
    from ..ops.dedup import filter_by_keys

    cfg = cfg or PipelineConfig()
    low = extracted.select_columns(["doc_id", "quality_score"]).filter(
        expr=f"quality_score < {int(min_quality)}"
    ).select_columns(["doc_id"])
    if low.count() == 0:
        return None  # type: ignore[return-value]

    # the filter's groups carry the corpus side: scale the partition
    # count with it (parquet-backed count is metadata-cheap)
    n_parts = max(2, min(64, read_corpus(input_path, cfg).count() // 200_000 + 1))
    matched = filter_by_keys(
        read_corpus(input_path, cfg),
        low,
        "doc_id",
        keep_matches=True,
        n_parts=n_parts,
    )

    def force_warm(batch: pa.Table) -> pa.Table:
        # REPLACE any pre-existing per-row force_route override (the
        # documented input column) rather than append a duplicate
        # field — escalation forces warm unconditionally
        if "force_route" in batch.column_names:
            batch = batch.drop_columns(["force_route"])
        return batch.append_column(
            "force_route", pa.array(["warm"] * batch.num_rows)
        )

    corpus = matched.map_batches(force_warm, batch_format="pyarrow", batch_size=1024)
    return build_pipeline(corpus, cfg)


def extract_with_escalation(
    input_path: str,
    cfg: Optional[PipelineConfig] = None,
    min_quality: int = 3,
) -> "ray.data.Dataset":
    """Extraction + escalation in one call: rows whose fast extraction
    scored below ``min_quality`` are replaced by their warm re-run.

    The first-pass output is materialized once (it is the OUTPUT table,
    bounded; at 10^12-doc scale this is the already-written parquet that
    the second pass reads back), then kept rows and escalated rows union
    into the final stream.
    """
    cfg = cfg or PipelineConfig()
    first = extract_corpus(input_path, cfg).materialize()
    second = escalate_low_quality(input_path, first, cfg, min_quality)
    if second is None:
        return first

    import pyarrow.compute as pc

    from ..functions import errors as errs

    kept = first.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("quality_score"), min_quality)),
        batch_format="pyarrow",
        batch_size=1024,
    )

    def tag_exhausted(batch: pa.Table) -> pa.Table:
        # rows STILL below the bar after the warm re-run: the ladder is
        # exhausted (reference ERR_MAX_RETRIES_REACHED,
        # /root/reference/src/FetchEngine.ts retry loop)
        low = pc.less(batch.column("quality_score"), min_quality)
        # ERR_CHALLENGE_PAGE outranks the retry-exhausted code (the
        # same precedence the extract stage applies): a challenge page
        # that stays blocked after the warm re-run is a CHALLENGE
        # failure, not a retry failure — eval gating keys on it
        challenge = pc.equal(
            batch.column("error_code"), pa.scalar(errs.ERR_CHALLENGE_PAGE)
        )
        code = pc.if_else(
            pc.and_(low, pc.invert(challenge)),
            pa.scalar(errs.ERR_MAX_RETRIES_REACHED),
            batch.column("error_code"),
        )
        idx = batch.schema.get_field_index("error_code")
        return batch.set_column(idx, "error_code", code)

    return kept.union(
        second.map_batches(tag_exhausted, batch_format="pyarrow", batch_size=1024)
    )
