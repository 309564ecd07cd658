"""C4 line-level cleaning (Raffel et al. 2020): rule-by-rule behavior,
DuckDB-oracle parity over the real documents table, and the streaming
``c4_clean`` corpus transform."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.c4 import (
    LINE_BLOCKLIST,
    add_c4_filters,
    c4_clean,
    c4_oracle_sql,
)

SF_DIR = "/root/testdata/sf0.001"

GOOD_PAGE = (
    "This is a fine opening sentence.\n"
    "short.\n"  # < 3 words
    "No terminal punctuation on this line\n"
    "Another good sentence follows right here!\n"
    "Is this a question, perhaps?\n"
    "We use javascript on this site.\n"  # blocklisted
    "Please read our cookie policy today.\n"  # blocklisted
    'He said "stop right there."\n'
    "A final proper sentence, number five."
)

PLANTS = [
    (1, GOOD_PAGE),
    (2, "Lorem Ipsum filler is here.\n" + "\n".join(f"A perfectly good sentence number {i}." for i in range(6))),
    (3, "function f() {\ngood sentences. here. more. and more. and more.\n}"),
    (4, "Only two good sentences here.\nAnd the second one is here."),
    (5, "Many sentences. In one line! Right? Yes. Indeed. Sure."),
    (6, ""),
    (7, "word\t\tword  word ends.\n   \t \ntrailing spaces sentence here.   \nmid\ttab sentence counts fine.\nfourth proper sentence right here.\nfifth proper sentence right here."),
]


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    out = add_c4_filters(pa.Table.from_pandas(df), **kw)
    return out.to_pandas()


def test_line_rules():
    df = pd.DataFrame({"doc_id": [1], "text": [GOOD_PAGE]})
    out = _run(df).iloc[0]
    kept = out["c4_text"].split("\n")
    assert kept == [
        "This is a fine opening sentence.",
        "Another good sentence follows right here!",
        "Is this a question, perhaps?",
        'He said "stop right there."',
        "A final proper sentence, number five.",
    ]
    assert out["c4_n_lines_kept"] == 5
    assert out["c4_n_lines_total"] == 9
    assert out["c4_n_sentences"] == 5
    assert bool(out["c4_page_pass"])


def test_page_rules():
    df = pd.DataFrame(PLANTS, columns=["doc_id", "text"])
    out = _run(df).set_index("doc_id")
    assert bool(out.loc[1, "c4_page_pass"])  # clean page
    assert not bool(out.loc[2, "c4_page_pass"])  # lorem ipsum
    assert not bool(out.loc[3, "c4_page_pass"])  # curly bracket
    assert not bool(out.loc[4, "c4_page_pass"])  # < 5 sentences
    # sentence count is punctuation-based, not line-based
    assert bool(out.loc[5, "c4_page_pass"])
    assert out.loc[5, "c4_n_sentences"] == 6
    assert out.loc[6, "c4_text"] == ""
    assert not bool(out.loc[6, "c4_page_pass"])
    # tabs count as word separators; whitespace-only lines drop
    assert out.loc[7, "c4_n_lines_kept"] == 5
    assert bool(out.loc[7, "c4_page_pass"])


def test_badwords_page_gate():
    df = pd.DataFrame(PLANTS, columns=["doc_id", "text"])
    out = _run(df, badwords=("perhaps",)).set_index("doc_id")
    assert not bool(out.loc[1, "c4_page_pass"])  # GOOD_PAGE contains it
    assert bool(out.loc[5, "c4_page_pass"])  # unaffected


def test_duckdb_oracle_parity_on_real_corpus():
    """Engine kernels == the published oracle SQL, line for line, over
    the real sf0.001 documents table plus every plant."""
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    plants = pd.DataFrame(PLANTS, columns=["doc_id", "text"])
    plants["doc_id"] += 5_000_000
    all_docs = pd.concat([docs, plants], ignore_index=True)

    eng = _run(all_docs)[
        ["doc_id", "c4_text", "c4_n_lines_kept", "c4_n_lines_total",
         "c4_n_sentences", "c4_page_pass"]
    ].sort_values("doc_id").reset_index(drop=True)

    con.register("all_docs", all_docs)
    orc = con.sql(c4_oracle_sql("SELECT doc_id, text FROM all_docs")).df()
    pd.testing.assert_frame_equal(eng, orc, check_dtype=False)


def test_c4_clean_streaming(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(PLANTS, columns=["doc_id", "text"]))
    out = c4_clean(ds).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 5, 7]
    assert out.loc[1, "text"].startswith("This is a fine opening sentence.")
    assert "javascript" not in out.loc[1, "text"]
    # schema: text replaced, helper columns gone
    assert list(out.columns) == ["text"]


def test_curate_c4_stage_collapses_boilerplate_variants(ray_session):
    """Two pages identical except for boilerplate lines become EXACT
    duplicates once C4 cleaning runs before dedup (the paper's
    ordering), so curate keeps only one."""
    from fetch_engines_ray.pipelines.curate import curate_corpus

    body = "\n".join(
        f"A perfectly ordinary body sentence number {i} sits at the heart of the page." for i in range(8)
    )
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                body + "\nPlease read our cookie policy today.",
                body + "\nWe use javascript on this site.",
                "\n".join(
                    f"A completely different page sentence number {i} lives at the top of the list." for i in range(8)
                ),
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    packed = curate_corpus(ds, c4_clean=True, max_tokens=10_000).to_pandas()
    kept_ids = sorted(i for ids in packed["doc_ids"] for i in ids)
    assert len(kept_ids) == 2  # one of {1,2} plus 3
    assert 3 in kept_ids
    assert not {1, 2}.issubset(kept_ids)


def test_blocklist_is_paper_set():
    # the lambda-built oracle quotes these verbatim — keep them ASCII
    # and apostrophe-free so the SQL stays valid
    for p in LINE_BLOCKLIST:
        assert p == p.lower() and "'" not in p


def test_dedup_lines_within_doc():
    """First occurrence kept per doc, blanks preserved, docs independent,
    DuckDB agrees on the rebuilt text."""
    import duckdb

    from fetch_engines_ray.ops.c4 import dedup_lines_within_doc

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "nav bar\nbody one.\nnav bar\n\nbody two.\n\nnav bar",
                "nav bar\nother body.",  # cross-doc repeats untouched
                "",
            ],
        }
    )
    out = dedup_lines_within_doc(pa.Table.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "text_line_deduped"] == "nav bar\nbody one.\n\nbody two.\n"
    assert out.loc[1, "n_dropped_lines"] == 2
    assert out.loc[2, "text_line_deduped"] == "nav bar\nother body."
    assert out.loc[2, "n_dropped_lines"] == 0
    assert out.loc[3, "text_line_deduped"] == ""

    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "WITH lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,"
        "  generate_subscripts(string_split(text, chr(10)), 1) AS ln FROM t),"
        " first AS (SELECT doc_id, line, ln, row_number() OVER"
        "   (PARTITION BY doc_id, line ORDER BY ln) AS occ FROM lines)"
        " SELECT doc_id, COALESCE(string_agg(line, chr(10) ORDER BY ln)"
        "   FILTER (WHERE occ = 1 OR line = ''), '') AS rebuilt"
        " FROM first GROUP BY doc_id ORDER BY doc_id"
    ).df()
    assert out["text_line_deduped"].tolist() == want["rebuilt"].tolist()


def test_curate_line_dedup_stages(ray_session):
    """The published line-cleanup ordering: within-doc repeats collapse
    first, then cross-corpus repeated lines survive only at their first
    (doc_id, line_no) occurrence — making boilerplate-only page
    variants exact duplicates for the dedup stage after."""
    from fetch_engines_ray.pipelines.curate import curate_corpus

    body_a = "\n".join(
        f"Unique article sentence number {i} sits at the heart of the page." for i in range(8)
    )
    body_b = "\n".join(
        f"A different article sentence number {i} lives at the top of the list." for i in range(8)
    )
    boiler = "Subscribe to the newsletter of the site today."
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                f"{boiler}\n{body_a}\n{boiler}",  # within-doc repeat
                f"{boiler}\n{body_b}",            # cross-doc repeat (loses to doc 1)
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    packed = curate_corpus(
        ds,
        within_doc_line_dedup=True,
        corpus_line_dedup=True,
        max_tokens=10_000,
    ).to_pandas()
    kept = sorted(i for ids in packed["doc_ids"] for i in ids)
    assert kept == [1, 2]
    # token count proves the cleanup: doc 1 keeps ONE boiler line (first
    # occurrence corpus-wide), doc 2 keeps none
    toks = {r["seq_id"]: r["total_tokens"] for _, r in packed.iterrows()}
    n_body_a = len(body_a.split()) + len(boiler.split())  # doc 1
    n_body_b = len(body_b.split())                        # doc 2
    assert sum(toks.values()) == n_body_a + n_body_b
