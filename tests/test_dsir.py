"""DSIR importance resampling (ops/dsir.py): distributed fit/weight/
resample matches the single-process reference exactly, selection is
enriched toward the target distribution, and the Gumbel keys are
deterministic and partitioning-invariant."""

import numpy as np
import pandas as pd
import pytest


def _corpus(seed: int = 4):
    rng = np.random.RandomState(seed)
    formal = "the committee shall review the proposed amendment pursuant to section".split()
    slang = "lol omg this meme is so wild fr no cap bruh".split()
    rows = []
    for i in range(120):
        words = formal if i % 2 == 0 else slang
        rows.append({"doc_id": i, "text": " ".join(rng.choice(words, size=25))})
    target = [" ".join(rng.choice(formal, size=25)) for _ in range(30)]
    return rows, target


@pytest.fixture(scope="module")
def fitted(ray_session):
    import ray.data

    from fetch_engines_ray.ops.dsir import (
        dsir_weights,
        log_importance_ratio,
        raw_bucket_counts,
        target_bucket_counts,
    )

    rows, target = _corpus()
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    lr = log_importance_ratio(
        target_bucket_counts(target), raw_bucket_counts(ds)
    )
    return rows, target, dsir_weights(ds, lr)


def test_weights_separate_dialects(fitted):
    rows, _, scored = fitted
    pdf = scored.to_pandas()
    formal = pdf[pdf["doc_id"] % 2 == 0]["dsir_logw"]
    slang = pdf[pdf["doc_id"] % 2 == 1]["dsir_logw"]
    # every target-dialect doc outweighs every off-target doc
    assert formal.min() > slang.max()


def test_resample_matches_reference(fitted):
    from fetch_engines_ray.ops.dsir import dsir_reference, dsir_resample

    rows, target, scored = fitted
    got = dsir_resample(scored, n=20, seed=42)["doc_id"].tolist()
    want = dsir_reference([(r["doc_id"], r["text"]) for r in rows], target, n=20, seed=42)
    assert got == want
    # enrichment: the selection is dominated by target-dialect docs
    assert sum(1 for d in got if d % 2 == 0) == 20


def test_resample_deterministic_across_partitionings(fitted, ray_session):
    import ray.data

    from fetch_engines_ray.ops.dsir import dsir_resample

    _, _, scored = fitted
    a = dsir_resample(scored, n=15, seed=7)["doc_id"].tolist()
    b = dsir_resample(scored.repartition(13), n=15, seed=7)["doc_id"].tolist()
    assert a == b


def test_seed_changes_selection_within_softmax(fitted):
    from fetch_engines_ray.ops.dsir import dsir_resample

    _, _, scored = fitted
    a = dsir_resample(scored, n=20, seed=1)["doc_id"].tolist()
    b = dsir_resample(scored, n=20, seed=2)["doc_id"].tolist()
    assert a != b  # different Gumbel draws
    # but both remain target-enriched
    assert sum(1 for d in a if d % 2 == 0) == 20
    assert sum(1 for d in b if d % 2 == 0) == 20


def test_empty_and_missing_text(ray_session):
    import ray.data

    from fetch_engines_ray.ops.dsir import dsir_weights

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0, 1], "text": ["", "hello world"]})
    )
    lr = np.zeros(8192)
    out = dsir_weights(ds, lr).to_pandas().sort_values("doc_id")
    assert out["dsir_logw"].tolist() == [0.0, 0.0]
