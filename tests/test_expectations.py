"""Data-quality gates (ops/expectations.py): each check fires on a
planted violation and passes on clean data; enforce() names every
failed gate; the scan pass handles nulls and empty datasets."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dirty_ds(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 3],  # duplicate id
            "lang": ["en", "de", "xx", "en", None],  # bad value + null
            "score": [0.5, 1.5, 0.2, 0.9, 0.1],  # 1.5 out of [0,1]
        }
    )
    return ray.data.from_pandas(df).repartition(3)


def test_checks_fire_on_planted_violations(dirty_ds):
    from fetch_engines_ray.ops import expectations as ex

    report = ex.validate(
        dirty_ds,
        [
            ex.not_null("lang"),
            ex.unique("doc_id"),
            ex.in_range("score", 0.0, 1.0),
            ex.accepted_values("lang", ["en", "de", "fr"]),
            ex.row_count(1, 100),
            ex.null_ratio_below("lang", 0.1),
        ],
    )
    by = dict(zip(report["check"], report["ok"]))
    assert not by["not_null(lang)"]
    assert not by["unique(doc_id)"]
    assert not by["in_range(score)[0.0,1.0]"]
    assert not by["accepted_values(lang)"]
    assert by["row_count[1,100]"]
    assert not by["null_ratio_below(lang)<0.1"]  # 1/5 = 0.2
    obs = dict(zip(report["check"], report["observed"]))
    assert obs["unique(doc_id)"] == 1  # one duplicate
    assert obs["in_range(score)[0.0,1.0]"] == 1
    assert obs["accepted_values(lang)"] == 1  # 'xx' (null ignored)


def test_clean_data_passes_and_enforce_returns_report(ray_session):
    import ray.data

    from fetch_engines_ray.ops import expectations as ex

    df = pd.DataFrame({"doc_id": range(50), "score": np.linspace(0, 1, 50)})
    ds = ray.data.from_pandas(df).repartition(4)
    report = ex.enforce(
        ds,
        [ex.not_null("doc_id"), ex.unique("doc_id"), ex.in_range("score", 0.0, 1.0), ex.row_count(50, 50)],
    )
    assert report["ok"].all()


def test_enforce_names_every_failure(dirty_ds):
    from fetch_engines_ray.ops import expectations as ex

    with pytest.raises(ex.ExpectationError, match="unique.doc_id.") as ei:
        ex.enforce(dirty_ds, [ex.unique("doc_id"), ex.in_range("score", 0.0, 1.0)])
    assert "in_range(score)" in str(ei.value)
    assert "2 data-quality gate(s) failed" in str(ei.value)


def test_gate_between_pipeline_stages(ray_session):
    """The intended composition: enforce() between extraction and
    curation stops the run instead of burning the downstream pass."""
    import ray.data

    from fetch_engines_ray.ops import expectations as ex

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    report = ex.enforce(
        docs,
        [
            ex.not_null("doc_id"),
            ex.unique("doc_id"),
            ex.not_null("text"),
            ex.row_count(1, 10_000_000),
        ],
    )
    assert report["ok"].all()
