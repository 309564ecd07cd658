"""Ray Data extraction stages.

The pipeline's heart: one ``map_batches`` stage (an **actor pool** — the
warm path holds compiled state, reference analog: the browser pool at
/root/reference/src/browser/PlaywrightBrowserPool.ts:285-606) that turns
interleaved ``(doc_id, spans)`` documents into extracted
``(doc_id, out_spans, title, route, …)`` rows.

Per-document semantics (reference: HybridEngine.fetchHTML,
/root/reference/src/HybridEngine.ts:126-223):

* classify raw HTML (app-shell score, soft-block) → route fast/warm
* fast: convert every ``html`` span to Markdown (converter chain M1-M22)
* warm: deterministically "hydrate" ``js_shell`` payloads into the shell
  (replacing the Playwright render), layout-parse ``pdf`` spans, then
  keep the warm result only when meaningfully better (C7 best-of)
* media spans (image/video/audio) pass through as placeholders with
  ``media_ref`` and relative order preserved exactly
"""

from __future__ import annotations

import re
from typing import Any, Optional

import pyarrow as pa

from ..functions import converter as conv
from ..functions import render_detection as rd

# Output spans: kind = "text" for markdown blocks, original kind for media.
SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("out_spans", pa.list_(SPAN_TYPE)),
        ("title", pa.string()),
        ("route", pa.string()),
        ("shell_score", pa.int32()),
        ("quality_score", pa.int32()),
        ("soft_block", pa.bool_()),
        ("is_forum", pa.bool_()),
        ("render_needed", pa.bool_()),
        ("error", pa.string()),
        ("n_out_chars", pa.int64()),
        ("archetype", pa.string()),
    ]
)

MEDIA_KINDS = frozenset({"image", "video", "audio"})

_ROOT_DIV_RE = re.compile(
    r"(<(?:div|main|section)[^>]*\bid=[\"']?(?:root|app)\b[\"']?[^>]*>)(\s*)(</(?:div|main|section)>)",
    re.I,
)
_BODY_CLOSE_RE = re.compile(r"</body>", re.I)


def hydrate_shell(shell_html: str, payload_html: str) -> str:
    """Deterministic stand-in for a browser hydration pass.

    Inserts the hydration payload into the empty root container (the DOM
    a JS framework would have produced), mirroring what
    ``page.content()`` returns after the reference's rendered-DOM
    quiet-window wait (/root/reference/src/PlaywrightEngine.ts:387-479).
    """
    new, n = _ROOT_DIV_RE.subn(lambda m: m.group(1) + payload_html + m.group(3), shell_html, count=1)
    if n:
        return new
    new, n = _BODY_CLOSE_RE.subn(payload_html + "</body>", shell_html, count=1)
    if n:
        return new
    return shell_html + payload_html


def parse_pdf_layout(layout_text: str) -> str:
    """Layout-parse a synthetic PDF text stream to Markdown.

    The corpus encodes PDF layout as tab-separated ``kind\\ttext`` lines
    (kinds: h1-h6, p, li, table with ``|``-separated cells and
    ``;``-separated rows).  This is the deterministic stand-in for a real
    PDF layout engine (north_rule: "PDF/layout parse"); the Ray-side
    plumbing (actor state, batching, schema) is identical to what a real
    parser would need.
    """
    blocks: list[str] = []
    for line in layout_text.split("\n"):
        if not line.strip():
            continue
        kind, _, text = line.partition("\t")
        kind = kind.strip().lower()
        text = text.strip()
        if kind in ("h1", "h2", "h3", "h4", "h5", "h6"):
            blocks.append("#" * int(kind[1]) + " " + text)
        elif kind == "li":
            blocks.append("- " + text)
        elif kind == "table":
            rows = [r.split("|") for r in text.split(";") if r]
            if rows:
                ncols = max(len(r) for r in rows)
                lines = ["| " + " | ".join(r + [""] * (ncols - len(r))) + " |" for r in rows]
                lines.insert(1, "| " + " | ".join(["---"] * ncols) + " |")
                blocks.append("\n".join(lines))
        else:  # p and anything unknown
            blocks.append(text)
    return "\n\n".join(blocks)


class DocumentExtractor:
    """Actor-pool batch extractor: ``pa.Table`` in → ``pa.Table`` out.

    Use with ``ds.map_batches(DocumentExtractor, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.  All compiled state (regexes, the
    selector cache warmed by a priming conversion) is built once per
    actor in ``__init__``.
    """

    def __init__(self, max_content_length: Optional[int] = None) -> None:
        self.max_content_length = max_content_length
        # Prime the selector cache / regex modules once per actor.
        conv.convert("<body><main><h1>warmup</h1><p>warmup doc</p></main></body>")

    # -- per-document ------------------------------------------------------
    def _convert_html(self, html: str, base_url: Optional[str]) -> conv.ConvertResult:
        return conv.convert(html, base_url=base_url, max_content_length=self.max_content_length)

    def extract_document(
        self, doc_id: str, spans: list[dict], base_url: Optional[str], archetype: str = ""
    ) -> dict[str, Any]:
        spans = sorted(spans, key=lambda s: s["offset"])
        html_parts = [s["text"] or "" for s in spans if s["kind"] == "html"]
        full_html = "\n".join(html_parts)
        has_js_shell = any(s["kind"] == "js_shell" for s in spans)
        has_pdf = any(s["kind"] == "pdf" for s in spans)

        assessment = rd.assess_html_render_need(full_html) if full_html else None
        soft_block = rd.is_soft_block_page(full_html) if full_html else False
        render_needed = assessment.render_likely_needed if assessment else False
        shell_score = assessment.render_likely_needed_score if assessment else 0
        # C9 routing predicate (/root/reference/src/HybridEngine.ts:58-66)
        route = "warm" if (soft_block or render_needed or has_js_shell or has_pdf) else "fast"

        out_spans: list[dict] = []
        title = ""
        is_forum = False
        error = ""
        order = 0
        first_text_emitted = False

        # Pre-collect hydration payloads (they are consumed by the html
        # span they hydrate, not emitted on their own).
        payloads = [s["text"] or "" for s in spans if s["kind"] == "js_shell"]
        payload_iter = iter(payloads)

        for s in spans:
            kind = s["kind"]
            if kind in MEDIA_KINDS:
                out_spans.append(
                    {"kind": kind, "text": "", "media_ref": s["media_ref"] or "", "order": order}
                )
                order += 1
                continue
            if kind == "js_shell":
                continue  # consumed by hydration
            try:
                if kind == "pdf":
                    md = conv.postprocess_markdown(
                        parse_pdf_layout(s["text"] or ""), self.max_content_length
                    )
                elif kind in ("html", "text"):
                    html = s["text"] or ""
                    if kind == "text":
                        md = html.strip()
                    else:
                        fast_res = self._convert_html(html, base_url)
                        md = fast_res.markdown
                        if not title:
                            title = fast_res.title
                        if route == "warm" and has_js_shell:
                            payload = next(payload_iter, None)
                            if payload is not None:
                                # Warm render + best-of merge (C7,
                                # /root/reference/src/HybridEngine.ts:183-204)
                                try:
                                    hydrated = hydrate_shell(html, payload)
                                    warm_res = self._convert_html(hydrated, base_url)
                                    baseline = rd.assess_serialized_content(md, "markdown")
                                    candidate = rd.assess_serialized_content(
                                        warm_res.markdown, "markdown"
                                    )
                                    if rd.is_rendered_content_meaningfully_better(
                                        baseline, candidate
                                    ):
                                        md = warm_res.markdown
                                        if warm_res.title:
                                            title = warm_res.title
                                except Exception:
                                    pass  # render failure keeps fast result (R1)
                        if fast_res.is_forum:
                            is_forum = True
                else:
                    # unknown span kind: opaque passthrough
                    out_spans.append(
                        {
                            "kind": kind,
                            "text": s["text"] or "",
                            "media_ref": s["media_ref"] or "",
                            "order": order,
                        }
                    )
                    order += 1
                    continue
            except Exception as exc:  # R3: conversion failure → raw passthrough
                error = f"ERR_CONVERSION: {exc}"
                md = s["text"] or ""
            if not first_text_emitted and base_url and md:
                md = conv.inject_source_url(md, base_url)
                first_text_emitted = True
            out_spans.append({"kind": "text", "text": md, "media_ref": "", "order": order})
            order += 1

        out_text = "\n\n".join(sp["text"] for sp in out_spans if sp["kind"] == "text")
        quality = rd.assess_serialized_content(out_text, "markdown").quality_score if out_text else 0

        return {
            "doc_id": doc_id,
            "out_spans": out_spans,
            "title": title,
            "route": route,
            "shell_score": shell_score,
            "quality_score": quality,
            "soft_block": soft_block,
            "is_forum": is_forum,
            "render_needed": render_needed,
            "error": error,
            "n_out_chars": len(out_text),
            "archetype": archetype,
        }

    # -- per-batch ---------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        base_urls = (
            batch.column("base_url").to_pylist()
            if "base_url" in batch.column_names
            else [None] * len(doc_ids)
        )
        archetypes = (
            batch.column("archetype").to_pylist()
            if "archetype" in batch.column_names
            else [""] * len(doc_ids)
        )
        rows = [
            self.extract_document(d, s or [], u, a or "")
            for d, s, u, a in zip(doc_ids, spans_col, base_urls, archetypes)
        ]
        return pa.Table.from_pylist(rows, schema=OUTPUT_SCHEMA)
