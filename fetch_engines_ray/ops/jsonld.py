"""JSON-LD structured-data extraction from HTML documents.

The schema.org metadata path: publishers embed
``<script type="application/ld+json">`` blocks carrying typed entities
(Article, Product, BreadcrumbList, ...).  The reference's structured
extraction surface (A9, ``src/StructuredContentEngine.ts``) pulls
declared fields out of page TEXT; this op pulls the page's DECLARED
entities out of its markup — the zero-model half of structured
extraction, and a curation staple (articles with valid Article markup
are a quality signal; Product/Recipe entities drive domain routing).

Reuses the engine's own DOM parser (``dom/parser.py``) — script
bodies are raw-text children there, exactly like the reference's
``blockTextElements`` config (``MarkdownConverter.test.ts`` M2 notes).
One streaming ``map_batches`` pass; output is one row per entity with
the raw JSON payload preserved for downstream schema-specific parses.
"""

from __future__ import annotations

import json
from typing import Iterator

import pyarrow as pa

import ray.data

from ..dom.parser import parse_html
from ..dom.selectors import select_all

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("block_idx", pa.int64()),   # which <script> block on the page
        ("entity_idx", pa.int64()),  # position within the block (@graph/list)
        ("jsonld_type", pa.string()),
        ("name", pa.string()),
        ("payload_json", pa.string()),
    ]
)

def _clean_payload(raw: str) -> str:
    # publishers wrap payloads in comments/CDATA (in any nesting, with
    # stray trailing semicolons) often enough to matter — peel until fixpoint
    s = raw.strip()
    while True:
        before = s
        for pre in ("<!--", "<![CDATA["):
            if s.startswith(pre):
                s = s[len(pre) :].lstrip()
        for suf in ("-->", "]]>", ";"):
            if s.endswith(suf):
                s = s[: -len(suf)].rstrip()
        if s == before:
            return s


def _entities(obj) -> Iterator[dict]:
    """Top-level JSON-LD value → entity dicts (@graph and bare lists
    expand; non-dict members are skipped)."""
    if isinstance(obj, dict):
        graph = obj.get("@graph")
        if isinstance(graph, list):
            for g in graph:
                if isinstance(g, dict):
                    yield g
        else:
            yield obj
    elif isinstance(obj, list):
        for o in obj:
            if isinstance(o, dict):
                yield o


def extract_jsonld_blocks(html: str) -> list[dict]:
    """All JSON-LD entities of one document:
    ``{"block_idx", "entity_idx", "jsonld_type", "name", "payload_json"}``.
    Malformed blocks are skipped (never raised) — broken metadata is
    routine on the open web."""
    out = []
    try:
        root = parse_html(html)
    except Exception:
        return out
    blocks = [
        el
        for el in select_all(root, "script")
        if (el.get("type") or "").split(";")[0].strip().lower() == "application/ld+json"
    ]
    for bi, el in enumerate(blocks):
        try:
            obj = json.loads(_clean_payload(el.text_content))
        except (ValueError, TypeError):
            continue
        for ei, ent in enumerate(_entities(obj)):
            t = ent.get("@type", "")
            if isinstance(t, list):
                t = ",".join(str(x) for x in t)
            name = ent.get("name") or ent.get("headline") or ""
            out.append(
                {
                    "block_idx": bi,
                    "entity_idx": ei,
                    "jsonld_type": str(t),
                    "name": str(name),
                    "payload_json": json.dumps(ent, sort_keys=True),
                }
            )
    return out


def jsonld_extract(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Corpus-shaped Dataset (``doc_id, spans``) → one row per embedded
    JSON-LD entity across every html span."""

    def per_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            base = 0
            for s in spans or []:
                if s.get("kind") != "html":
                    continue
                for ent in extract_jsonld_blocks(s.get("text") or ""):
                    ent["block_idx"] += base
                    rows.append({"doc_id": doc_id, **ent})
                base += 1000  # block ids stay unique across spans
        return pa.Table.from_pylist(rows, schema=_OUT_SCHEMA)

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=256)
