"""Ingest: crawl deliveries → extraction → the documents table the
curation chain consumes — the missing bridge that closes the engine's
end-to-end loop:

    read_warc / read_archive / read_corpus        (crawl-shaped input)
      → build_pipeline                            (HTML → clean spans)
      → extracted_to_documents                    (spans → flat text)
      → curate_corpus / text analysis / dedup     (documents-shaped ops)

``extracted_to_documents`` flattens each document's ``text`` out-spans
(the markdown sink's exact join rule, ``sources/io.py
write_markdown_tree``) and emits the curation-side schema: the string
``doc_id`` is preserved for lineage, and a stable 64-bit
``doc_int_id`` (blake2b of the doc_id — collision odds ~n²/2⁶⁵) is
added because the packing/dedup chain keys on int64 ids.  One
streaming ``map_batches``; no shuffle, no driver state.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa

import ray.data

from .extract import PipelineConfig, build_pipeline

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("doc_int_id", pa.int64()),
        ("text", pa.string()),
        ("n_chars", pa.int64()),
        ("base_url", pa.string()),
    ]
)


def _int_id(doc_id: str) -> int:
    h = hashlib.blake2b(doc_id.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big", signed=True)


def extracted_to_documents(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Extraction output (``doc_id, out_spans[, base_url]``) → the flat
    documents table (``DOCUMENTS_SCHEMA``)."""

    def flatten(batch: pa.Table) -> pa.Table:
        names = set(batch.column_names)
        urls = (
            batch["base_url"].to_pylist()
            if "base_url" in names
            else [""] * batch.num_rows
        )
        rows = []
        for doc_id, spans, url in zip(
            batch["doc_id"].to_pylist(), batch["out_spans"].to_pylist(), urls
        ):
            from fetch_engines_ray.sources.io import join_text_spans

            text = join_text_spans(spans)
            rows.append(
                {
                    "doc_id": str(doc_id),
                    "doc_int_id": _int_id(str(doc_id)),
                    "text": text,
                    "n_chars": len(text),
                    "base_url": url or "",
                }
            )
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return ds.map_batches(flatten, batch_format="pyarrow", batch_size=512)


def ingest_corpus(
    source: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None
) -> "ray.data.Dataset":
    """Corpus-shaped source Dataset → flat documents table (lazy,
    single stream through the extraction stages)."""
    return extracted_to_documents(build_pipeline(source, cfg))
