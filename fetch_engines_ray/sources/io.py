"""Sources and sinks for the extraction engine.

Reference analogs (SURVEY.md §2.1):

* S1/S2 ``FetchEngine.fetchHTML/fetchContent`` — network fetch sources.
  Here documents are pre-fetched into a corpus table; the readers below
  load that corpus (parquet always; Lance behind an import-try since the
  sandbox lacks the ``lance`` wheel) or build corpus-shaped rows from
  raw ``.html`` files / JSONL (/root/reference/src/FetchEngine.ts:83-259).
* S6 Markdown file sink — one ``.md`` per document directly under
  ``out_dir`` with a collision-proof hashed name
  (/root/reference/scripts/hybrid-md-dump.mjs:18-39).
* S7 eval JSON report sink — per-archetype pass-rate summary
  (/root/reference/scripts/eval-auto-render.mjs:142-174).

All readers return a ``ray.data.Dataset`` with the interleaved-span
input schema ``(doc_id, spans: list<struct<kind,text,media_ref,offset>>,
base_url, archetype)``; all sinks are distributed ``map_batches`` /
``write_*`` consumers — nothing materializes the full dataset on the
driver.
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterable, Optional

import pyarrow as pa

import ray.data

from fetch_engines_ray.arrowclean import read_parquet_clean

from ..stages.extract import RAW_SPAN_TYPE

INPUT_COLUMNS = ("doc_id", "spans", "archetype", "base_url")

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(RAW_SPAN_TYPE)),
        ("base_url", pa.string()),
        ("archetype", pa.string()),
    ]
)


def join_text_spans(spans) -> str:
    """The markdown sink's span-join rule — ONE implementation shared
    with the ingest bridge (pipelines/ingest.py), so the documents
    table and the markdown delivery can never desynchronize."""
    return "\n\n".join(
        s["text"] for s in (spans or []) if s["kind"] == "text" and s["text"]
    )


def read_corpus_parquet(path: str, columns: Optional[Iterable[str]] = None) -> "ray.data.Dataset":
    """Column-pruned parquet corpus reader (only requested columns leave
    storage)."""
    return read_parquet_clean(path, columns=list(columns or INPUT_COLUMNS))


def read_corpus_lance(path: str, columns: Optional[Iterable[str]] = None) -> "ray.data.Dataset":
    """Lance corpus reader (north-rule storage format).  Falls back with
    a clear error when the ``lance`` wheel is absent (this sandbox)."""
    try:
        import lance  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; "
            "use read_corpus_parquet (identical schema and downstream pipeline)"
        ) from exc
    return ray.data.read_lance(path, columns=list(columns or INPUT_COLUMNS))


def read_corpus(path: str, columns: Optional[Iterable[str]] = None) -> "ray.data.Dataset":
    """Auto-detecting corpus reader: ``.lance`` dataset dir → Lance,
    else parquet."""
    if path.rstrip("/").endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        return read_corpus_lance(path, columns)
    return read_corpus_parquet(path, columns)


def _doc_row(doc_id: str, html: str, base_url: str = "", archetype: str = "") -> dict:
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "html", "text": html, "media_ref": "", "offset": 0}],
        "base_url": base_url,
        "archetype": archetype,
    }


def read_html_dir(path: str) -> "ray.data.Dataset":
    """Directory of raw ``.html`` files → corpus-shaped Dataset (one
    single-span document per file; doc_id = relative path).

    File listing happens on the driver (cheap); file CONTENT is read
    inside distributed tasks so bytes never flow through the driver.
    """
    files = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith((".html", ".htm")):
                full = os.path.join(root, n)
                files.append({"path": full, "doc_id": os.path.relpath(full, path)})
    if not files:
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=CORPUS_SCHEMA))

    def load(batch: pa.Table) -> pa.Table:
        rows = []
        for p, d in zip(batch.column("path").to_pylist(), batch.column("doc_id").to_pylist()):
            with open(p, "r", encoding="utf-8", errors="replace") as f:
                rows.append(_doc_row(d, f.read()))
        return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)

    return ray.data.from_items(files).map_batches(load, batch_format="pyarrow", batch_size=64)


def read_jsonl_docs(path: str) -> "ray.data.Dataset":
    """JSONL reader: one object per line with ``doc_id`` + either
    ``spans`` (full interleaved shape) or ``html`` (single-span doc);
    optional ``base_url``/``archetype``."""

    def to_corpus(batch: pa.Table) -> pa.Table:
        rows = []
        for rec in batch.to_pylist():
            if rec.get("spans") is not None:
                rows.append(
                    {
                        "doc_id": str(rec["doc_id"]),
                        "spans": [
                            {
                                "kind": s.get("kind", "html"),
                                "text": s.get("text", "") or "",
                                "media_ref": s.get("media_ref", "") or "",
                                # Arrow null-pads a missing offset field
                                # when other docs carry it (key present,
                                # value None — .get's default never
                                # applies), so check the VALUE
                                "offset": (
                                    int(s["offset"])
                                    if s.get("offset") is not None
                                    else i
                                ),
                            }
                            for i, s in enumerate(rec["spans"])
                        ],
                        "base_url": rec.get("base_url", "") or "",
                        "archetype": rec.get("archetype", "") or "",
                    }
                )
            else:
                rows.append(
                    _doc_row(
                        str(rec["doc_id"]),
                        rec.get("html", "") or "",
                        rec.get("base_url", "") or "",
                        rec.get("archetype", "") or "",
                    )
                )
        return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)

    return ray.data.read_json(path).map_batches(to_corpus, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------

_SAFE_RE = re.compile(r"[^A-Za-z0-9._-]+")


def _safe_name(s: str) -> str:
    return _SAFE_RE.sub("_", s).strip("_") or "doc"


def write_markdown_tree(ds: "ray.data.Dataset", out_dir: str) -> int:
    """S6 analog: write each document's text spans as one ``.md`` file
    under ``out_dir``; returns the number of distinct files written.

    File names are ``<sanitized doc_id>-<hash8>.md`` — the hash of the
    RAW doc_id guarantees distinct doc_ids never collide even when they
    sanitize to the same string ('a/b' vs 'a_b').  Runs as a distributed
    ``map_batches`` consumer — each task writes its own files and emits
    one manifest row per file; the count is over distinct paths.
    """
    import hashlib

    def dump(batch: pa.Table) -> pa.Table:
        os.makedirs(out_dir, exist_ok=True)
        names = []
        for rec in batch.select(["doc_id", "out_spans"]).to_pylist():
            text = join_text_spans(rec["out_spans"])
            suffix = hashlib.blake2b(str(rec["doc_id"]).encode(), digest_size=4).hexdigest()
            name = f"{_safe_name(rec['doc_id'])}-{suffix}.md"
            tmp = os.path.join(out_dir, "." + name + ".tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(text)
            os.replace(tmp, os.path.join(out_dir, name))
            names.append({"file": name})
        return pa.Table.from_pylist(names, schema=pa.schema([("file", pa.string())]))

    manifest = ds.map_batches(dump, batch_format="pyarrow", batch_size=256)
    return int(manifest.unique("file").__len__())


def write_corpus_parquet(ds: "ray.data.Dataset", out_dir: str) -> None:
    ds.write_parquet(out_dir)


def write_corpus_lance(ds: "ray.data.Dataset", out_path: str) -> None:
    """Lance corpus writer (north-rule storage format) — symmetric with
    :func:`read_corpus_lance`, same import guard for environments
    without the ``lance`` wheel (this sandbox)."""
    try:
        import lance  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; "
            "use write_corpus_parquet (identical schema and downstream pipeline)"
        ) from exc
    ds.write_lance(out_path)


# Pass-rate gate thresholds mirrored from the reference's nightly eval
# (/root/reference/src/evals/auto-render-cases.ts:23-25).
MIN_GATED_PASS_RATE = 0.8
MIN_GATED_STATIC_PASS_RATE = 1.0
MIN_GATED_SPA_PASS_RATE = 0.5

# Archetypes whose cases the reference buckets as category "spa"
# (client-rendered; everything else is "static") —
# auto-render-cases.ts:27-187.
_SPA_ARCHETYPES = ("spa",)


def write_eval_report(ds: "ray.data.Dataset", path: str, min_text_length: int = 40) -> dict:
    """S7 analog: per-archetype pass-rate report WITH the reference's
    gate verdicts.

    A "pass" mirrors the reference's per-case checks (markdown produced,
    min text length — /root/reference/scripts/eval-auto-render.mjs:89-99);
    the gate summary mirrors ``summarize`` (eval-auto-render.mjs:27-62):
    gated cases split into static/spa categories, per-category pass
    rates compared against the exported thresholds, and an overall
    ``gates_passed`` verdict.  A document is *ungated* (the reference's
    ``gate: false`` known-hard cases) when it dead-lettered as a
    challenge page — no engine can extract content that was never
    served — or is a conformance fixture rather than a corpus doc.
    Aggregation is a distributed groupby; only the tiny summary reaches
    the driver / JSON file.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    has_error = "error_code" in ds.schema().names

    def flag(batch: pa.Table) -> pa.Table:
        passed = pc.greater_equal(batch.column("n_out_chars"), min_text_length)
        arch = batch.column("archetype")
        if has_error:
            hard = pc.equal(batch.column("error_code"), "ERR_CHALLENGE_PAGE")
        else:
            hard = pc.equal(arch, "__never__")
        gated = pc.and_(pc.invert(hard), pc.not_equal(arch, "fixture"))
        spa = pc.is_in(arch, value_set=pa.array(_SPA_ARCHETYPES))
        t = batch.select(["archetype", "quality_score"])
        t = t.append_column("passed", pc.cast(passed, pa.int64()))
        t = t.append_column("gated", pc.cast(gated, pa.int64()))
        t = t.append_column(
            "gated_pass", pc.cast(pc.and_(gated, passed), pa.int64())
        )
        t = t.append_column(
            "gated_spa", pc.cast(pc.and_(gated, spa), pa.int64())
        )
        t = t.append_column(
            "gated_spa_pass", pc.cast(pc.and_(pc.and_(gated, spa), passed), pa.int64())
        )
        return t

    agg = (
        ds.map_batches(flag, batch_format="pyarrow", batch_size=1024)
        .groupby("archetype")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("passed", alias_name="n_passed"),
            Sum("gated", alias_name="n_gated"),
            Sum("gated_pass", alias_name="n_gated_pass"),
            Sum("gated_spa", alias_name="n_gated_spa"),
            Sum("gated_spa_pass", alias_name="n_gated_spa_pass"),
            Mean("quality_score", alias_name="mean_quality"),
        )
        .to_pandas()
        .sort_values("archetype")
    )
    per = {
        r["archetype"]: {
            "n_docs": int(r["n_docs"]),
            "pass_rate": round(float(r["n_passed"]) / max(1, int(r["n_docs"])), 4),
            "mean_quality": round(float(r["mean_quality"]), 3),
        }
        for _, r in agg.iterrows()
    }
    total_docs = int(agg["n_docs"].sum())
    n_gated = int(agg["n_gated"].sum())
    n_gated_pass = int(agg["n_gated_pass"].sum())
    n_spa = int(agg["n_gated_spa"].sum())
    n_spa_pass = int(agg["n_gated_spa_pass"].sum())
    n_static = n_gated - n_spa
    n_static_pass = n_gated_pass - n_spa_pass
    # empty-set conventions match the reference: no gated cases -> 0,
    # no gated static/spa cases -> 1 (eval-auto-render.mjs:40-44)
    gated_rate = n_gated_pass / n_gated if n_gated else 0.0
    static_rate = n_static_pass / n_static if n_static else 1.0
    spa_rate = n_spa_pass / n_spa if n_spa else 1.0
    gates = {
        "gated_cases": n_gated,
        "gated_pass_rate": round(gated_rate, 4),
        "gated_static_pass_rate": round(static_rate, 4),
        "gated_spa_pass_rate": round(spa_rate, 4),
        "thresholds": {
            "gated_pass_rate": MIN_GATED_PASS_RATE,
            "gated_static_pass_rate": MIN_GATED_STATIC_PASS_RATE,
            "gated_spa_pass_rate": MIN_GATED_SPA_PASS_RATE,
        },
        "gate_pass": {
            "gated": gated_rate >= MIN_GATED_PASS_RATE,
            "static": static_rate >= MIN_GATED_STATIC_PASS_RATE,
            "spa": spa_rate >= MIN_GATED_SPA_PASS_RATE,
        },
        "gates_passed": (
            gated_rate >= MIN_GATED_PASS_RATE
            and static_rate >= MIN_GATED_STATIC_PASS_RATE
            and spa_rate >= MIN_GATED_SPA_PASS_RATE
        ),
    }
    total_passed = int(agg["n_passed"].sum())
    report = {
        "archetypes": per,
        "overall": {
            "n_docs": total_docs,
            "pass_rate": round(total_passed / max(1, total_docs), 4),
        },
        "gates": gates,
    }
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    return report
