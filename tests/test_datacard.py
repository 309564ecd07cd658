"""Datacard generator (ops/datacard.py): the rendered markdown carries
the profile numbers, gate outcomes and drift verdicts, deterministically."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def test_datacard_sections_and_determinism(docs, tmp_path):
    from fetch_engines_ray.ops import expectations as ex
    from fetch_engines_ray.ops.datacard import build_datacard, write_datacard

    checks = [ex.not_null("doc_id"), ex.unique("doc_id"), ex.row_count(1, 10**9)]
    md1 = build_datacard(docs, "documents-sf0.001", checks=checks)
    md2 = write_datacard(str(tmp_path / "card.md"), docs, "documents-sf0.001", checks=checks)
    assert md1 == md2  # deterministic render
    assert "# Datacard: documents-sf0.001" in md1
    assert "Rows: **500**" in md1
    assert "## Column profile" in md1 and "| doc_id |" in md1
    assert "## Quality gates" in md1 and "3/3 gates pass." in md1
    assert (tmp_path / "card.md").read_text() == md2


def test_datacard_failing_gate_and_drift(docs, ray_session):
    import ray.data

    from fetch_engines_ray.ops import expectations as ex
    from fetch_engines_ray.ops.datacard import build_datacard

    # shifted "current" snapshot: halve every text length
    cur = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(200),
                "text": ["x " * 5] * 200,
                "lang": ["zz"] * 200,  # unseen language
                "n_chars": np.full(200, 10, dtype=np.int64),
            }
        )
    )
    ref = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(300),
                "text": ["y " * 50] * 300,
                "lang": ["en"] * 300,
                "n_chars": np.full(300, 100, dtype=np.int64),
            }
        )
    )
    md = build_datacard(
        cur,
        "shifted",
        checks=[ex.row_count(1000, 2000)],  # fails: only 200 rows
        reference=ref,
        drift_numeric=["n_chars"],
        drift_categorical=["lang"],
    )
    assert "0/1 gates pass." in md and "ATTENTION" in md
    assert "## Drift vs reference snapshot" in md
    assert "ACTION REQUIRED" in md  # constant n_chars shift + unseen lang


def test_datacard_text_quality_section(docs):
    from fetch_engines_ray.ops.datacard import build_datacard

    md = build_datacard(docs, "documents-sf0.001", text_col="text")
    assert "## Text quality" in md
    for metric in (
        "gopher_pass_rate",
        "gopher_repetition_pass_rate",
        "c4_page_pass_rate",
        "encoding_ok_rate",
        "mean_whitespace_tokens",
    ):
        assert metric in md
    # the synthetic docs are single-line and unpunctuated: C4 page rate
    # must be 0, encoding must be clean, and the card must agree with a
    # direct computation of the gopher rate
    import pyarrow as pa

    from fetch_engines_ray.ops.textstats import add_gopher_quality_flags

    df = docs.to_pandas()
    flags = add_gopher_quality_flags(
        pa.Table.from_pandas(df[["text"]]), text_col="text"
    ).to_pandas()
    want_rate = round(flags["gopher_pass"].mean(), 4)
    assert f"| gopher_pass_rate | {want_rate}" in md
    assert "| c4_page_pass_rate | 0 |" in md
    assert "| encoding_ok_rate | 1 |" in md
    # re-render deterministic
    assert md == build_datacard(docs, "documents-sf0.001", text_col="text")
