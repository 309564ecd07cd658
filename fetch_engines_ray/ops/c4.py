"""C4-style line-level corpus cleaning (Raffel et al. 2020, JMLR 21,
"Exploring the Limits of Transfer Learning...", §2.2 — the public C4
heuristics).  The reference engine has no line-level cleaner (its
boilerplate removal is DOM-side, `functions/converter.py` M15/M16);
this is the post-extraction text-side analog every large training-data
pipeline runs before dedup.

Rules implemented (deterministic, integer/boolean outputs so the whole
op is SQL-oracle comparable):

Line kept iff (``r`` = line rstripped of space/tab/CR):
  1. ``r`` ends in terminal punctuation: ``.``, ``!``, ``?`` or ``"``;
  2. ``r`` contains at least ``min_words`` space/tab-separated words
     (word = a run of ``[^ \\t]`` — an explicit ASCII class, NOT
     ``\\s``, so pandas/RE2/DuckDB agree on unicode whitespace);
  3. the lowercased line contains none of the boilerplate markers
     (``javascript`` plus the cookie/policy phrases from the paper).

Page kept iff:
  4. the CLEANED text contains >= ``min_sentences`` sentence-final
     marks (count of ``[.!?]`` — a deterministic stand-in for the
     paper's sentence splitter);
  5. the ORIGINAL text contains no ``{`` (code page marker);
  6. the lowercased ORIGINAL text does not contain ``lorem ipsum``;
  7. optionally, none of the caller-supplied ``badwords`` appear
     (the paper uses a public blocklist; none is embedded here —
     pass your own).

Scale shape: one ``map_batches`` pass, all C-level pandas string
kernels over an exploded line frame (split -> explode -> vectorized
rules -> level-0 groupby reassembly) — no Python loop over rows or
lines.  No shuffle; page filtering is a plain batch filter.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

# Boilerplate phrases from the C4 paper (public): lines containing any
# of these are dropped.  Matched case-insensitively as plain substrings.
LINE_BLOCKLIST: tuple[str, ...] = (
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "uses cookies",
    "use of cookies",
    "use cookies",
)

TERMINAL_CHARS: tuple[str, ...] = (".", "!", "?", '"')


def add_c4_filters(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
) -> pa.Table:
    """Append the C4 cleaning columns to ``batch`` (no rows dropped —
    composable): ``c4_text`` (kept lines joined by ``\\n``),
    ``c4_n_lines_kept``, ``c4_n_lines_total``, ``c4_n_sentences`` and
    ``c4_page_pass``."""
    s = batch[text_col].to_pandas().fillna("")
    s.index = pd.RangeIndex(len(s))

    ex = s.str.split("\n").explode()
    r = ex.str.rstrip(" \t\r")
    ends = r.str[-1:].isin(TERMINAL_CHARS)
    n_words = r.str.count(r"[^ \t]+")
    low = ex.str.lower()
    bad = pd.Series(False, index=ex.index)
    for marker in LINE_BLOCKLIST:
        bad |= low.str.contains(marker, regex=False)
    keep = ends & (n_words >= min_words) & ~bad

    c4_text = (
        ex[keep].groupby(level=0).agg("\n".join).reindex(s.index, fill_value="")
    )
    n_kept = keep.groupby(level=0).sum().reindex(s.index, fill_value=0).astype("int64")
    n_total = ex.groupby(level=0).size().reindex(s.index, fill_value=0).astype("int64")
    n_sent = c4_text.str.count(r"[.!?]").astype("int64")

    low_doc = s.str.lower()
    page_pass = (
        (n_sent >= min_sentences)
        & ~s.str.contains("{", regex=False)
        & ~low_doc.str.contains("lorem ipsum", regex=False)
    )
    for w in badwords:
        page_pass &= ~low_doc.str.contains(w.lower(), regex=False)

    batch = batch.append_column("c4_text", pa.array(c4_text, type=pa.string()))
    batch = batch.append_column("c4_n_lines_kept", pa.array(n_kept, type=pa.int64()))
    batch = batch.append_column("c4_n_lines_total", pa.array(n_total, type=pa.int64()))
    batch = batch.append_column("c4_n_sentences", pa.array(n_sent, type=pa.int64()))
    return batch.append_column("c4_page_pass", pa.array(page_pass, type=pa.bool_()))


def c4_clean(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
) -> "ray.data.Dataset":
    """Apply the C4 cleaning as a corpus transform: failing pages are
    DROPPED and ``text_col`` is REPLACED by the cleaned text (the
    helper columns do not survive).  One streaming ``map_batches``
    stage — run it before dedup, as the paper does."""

    def clean(batch: pa.Table) -> pa.Table:
        out = add_c4_filters(
            batch,
            text_col=text_col,
            min_words=min_words,
            min_sentences=min_sentences,
            badwords=badwords,
        )
        out = out.filter(out.column("c4_page_pass"))
        idx = out.schema.get_field_index(text_col)
        out = out.set_column(idx, text_col, out.column("c4_text"))
        return out.drop_columns(
            [
                "c4_text",
                "c4_n_lines_kept",
                "c4_n_lines_total",
                "c4_n_sentences",
                "c4_page_pass",
            ]
        )

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=4096)


def dedup_lines_within_doc(
    batch: pa.Table, text_col: str = "text", sep: str = "\n"
) -> pa.Table:
    """WITHIN-document repeated-line removal (each line keeps its first
    occurrence inside its own document; order preserved) — the
    per-record cleanup that pairs with the cross-corpus
    ``ops.dedup.line_dedup``: run this first to strip per-page repeated
    boilerplate (nav fragments repeated per section), then the
    corpus-wide pass for cross-page boilerplate.  ``sep="\\n\\n"``
    dedups paragraphs instead.  Vectorized: one explode + one
    first-occurrence mask (pandas duplicated on (doc, line), C level)
    + one groupby-join reassembly — no shuffle, per-record parallel.

    Appends ``text_line_deduped`` and ``n_dropped_lines``; empty lines
    are NOT deduped (blank separators stay)."""
    s = batch[text_col].to_pandas().fillna("")
    s.index = pd.RangeIndex(len(s))
    ex = s.str.split(sep, regex=False).explode()
    doc = ex.index.to_numpy()
    dup = pd.DataFrame({"doc": doc, "line": ex.to_numpy()}).duplicated(
        ["doc", "line"]
    ).to_numpy() & (ex.to_numpy() != "")
    kept = ex[~dup]
    text = kept.groupby(level=0).agg(sep.join).reindex(s.index, fill_value="")
    n_drop = (
        pd.Series(dup).groupby(doc).sum().reindex(s.index, fill_value=0).astype("int64")
    )
    batch = batch.append_column(
        "text_line_deduped", pa.array(text, type=pa.string())
    )
    return batch.append_column("n_dropped_lines", pa.array(n_drop, type=pa.int64()))


def c4_oracle_sql(
    source_sql: str,
    min_words: int = 3,
    min_sentences: int = 5,
) -> str:
    """The exactly-equivalent DuckDB form of :func:`add_c4_filters`
    (list lambdas preserve line order; ``rtrim``/ASCII word class match
    the pandas kernels character-for-character).  ``source_sql`` must
    yield ``(doc_id, text)``."""
    rt = "rtrim(l, ' ' || chr(9) || chr(13))"
    blk = " AND ".join(
        f"NOT contains(lower(l), '{p}')" for p in LINE_BLOCKLIST
    )
    kept_text = "COALESCE(array_to_string(kept, chr(10)), '')"
    n_sent = f"len(regexp_extract_all({kept_text}, '[.!?]'))"
    return (
        f"WITH j AS (SELECT doc_id, text,"
        f" list_filter(string_split(text, chr(10)), l ->"
        f" regexp_matches({rt}, '[.!?\"]$')"
        f" AND len(regexp_extract_all({rt}, '[^ ' || chr(9) || ']+')) >= {min_words}"
        f" AND {blk}) AS kept"
        f" FROM ({source_sql}))"
        f" SELECT doc_id, {kept_text} AS c4_text,"
        f" CAST(len(kept) AS BIGINT) AS c4_n_lines_kept,"
        f" CAST(len(string_split(text, chr(10))) AS BIGINT) AS c4_n_lines_total,"
        f" CAST({n_sent} AS BIGINT) AS c4_n_sentences,"
        f" ({n_sent} >= {min_sentences}"
        f"  AND NOT contains(text, chr(123))"
        f"  AND NOT contains(lower(text), 'lorem ipsum')) AS c4_page_pass"
        f" FROM j ORDER BY doc_id"
    )
