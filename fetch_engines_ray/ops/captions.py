"""Caption mining: (media, adjacent-text) pairs from interleaved spans.

Multimodal training corpora (CLIP/LAION-style image-text pairs and
their audio/video analogs) are built by pairing each media item with
its nearest textual context.  The reference engine preserves media
position via ``media_ref`` placeholders in the markdown stream
(`src/MarkdownConverter.ts` — span order is the per-row invariant this
repo pins), which is exactly the structure caption mining needs: for
every media span, the nearest PRECEDING and FOLLOWING text spans in
document order are the caption candidates.

Ray-Data shape: one ``map_batches`` pass over the extraction output —
caption pairing is doc-local by construction (spans of one document
live in one row), so there is NO shuffle at any scale; the per-doc
span walk is a tiny Python loop over an already-extracted list (same
posture as ``ops.multimodal.media_spans_dataset``).
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray

CAPTION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("span_index", pa.int64()),
        ("caption_before", pa.string()),
        ("caption_after", pa.string()),
        ("caption", pa.string()),
        ("caption_source", pa.string()),  # after | before | none
    ]
)


def _clip_tail(text: str, max_chars: int) -> str:
    """Last ``max_chars`` of ``text``, cut forward to a word boundary."""
    t = (text or "").strip()
    if len(t) <= max_chars:
        return t
    cut = t[len(t) - max_chars :]
    sp = cut.find(" ")
    return cut[sp + 1 :] if 0 <= sp < len(cut) - 1 else cut


def _clip_head(text: str, max_chars: int) -> str:
    """First ``max_chars`` of ``text``, cut back to a word boundary."""
    t = (text or "").strip()
    if len(t) <= max_chars:
        return t
    cut = t[:max_chars]
    sp = cut.rfind(" ")
    return cut[:sp] if sp > 0 else cut


def mine_caption_pairs(
    extracted_ds: "ray.data.Dataset",
    max_chars: int = 400,
    kinds: Sequence[str] = ("image", "video", "audio"),
    require_caption: bool = False,
    spans_col: str = "out_spans",
) -> "ray.data.Dataset":
    """One row per media span with its nearest-text caption candidates.

    ``caption_after`` (the text block immediately following the media —
    in practice the figure caption position) is preferred as ``caption``;
    ``caption_before`` is the fallback.  Captions are clipped to
    ``max_chars`` at word boundaries, taking the text NEAREST the media:
    the tail of the preceding block, the head of the following one.
    ``require_caption=True`` drops media with no adjacent text at all.
    """
    kindset = frozenset(kinds)

    def mine(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch[spans_col].to_pylist()
        ):
            spans = spans or []
            # nearest preceding / following text per position, two sweeps
            n = len(spans)
            prev_text = [""] * n
            last = ""
            for i, s in enumerate(spans):
                prev_text[i] = last
                if s["kind"] == "text" and (s.get("text") or "").strip():
                    last = s["text"]
            next_text = [""] * n
            nxt = ""
            for i in range(n - 1, -1, -1):
                next_text[i] = nxt
                if spans[i]["kind"] == "text" and (spans[i].get("text") or "").strip():
                    nxt = spans[i]["text"]
            for i, s in enumerate(spans):
                if s["kind"] not in kindset:
                    continue
                before = _clip_tail(prev_text[i], max_chars)
                after = _clip_head(next_text[i], max_chars)
                caption, source = (
                    (after, "after") if after else (before, "before") if before else ("", "none")
                )
                if require_caption and source == "none":
                    continue
                rows.append(
                    {
                        "doc_id": str(doc_id),
                        "media_ref": s.get("media_ref") or "",
                        "kind": s["kind"],
                        "span_index": i,
                        "caption_before": before,
                        "caption_after": after,
                        "caption": caption,
                        "caption_source": source,
                    }
                )
        return pa.Table.from_pylist(rows, schema=CAPTION_SCHEMA)

    return extracted_ds.map_batches(mine, batch_format="pyarrow", batch_size=1024)
