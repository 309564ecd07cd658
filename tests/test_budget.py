"""Token-budget selection (ops/budget.py) vs a brute-force window rule.

The contract is the SQL window rule
``SUM(tokens) OVER (ORDER BY score DESC, id ASC) <= budget`` — the
running total includes the row itself.  The brute-force oracle here is
a literal pandas transcription of that rule.
"""
import numpy as np
import pandas as pd
import pytest

from fetch_engines_ray.ops import budget as B


def _brute(df: pd.DataFrame, budget: int) -> set[int]:
    d = df.sort_values(["score", "doc_id"], ascending=[False, True])
    run = d["tokens"].cumsum()
    return set(d.loc[run <= budget, "doc_id"].tolist())


def _mk(rows) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=["doc_id", "score", "tokens"]).astype("int64")


def _run(df: pd.DataFrame, budget: int) -> set[int]:
    import ray.data

    ds = ray.data.from_pandas(df).repartition(4)
    out = B.select_token_budget(ds, budget, "score", "tokens").to_pandas()
    if out.empty:
        return set()
    return set(out["doc_id"].tolist())


def test_budget_matches_window_rule(ray_session):
    rng = np.random.default_rng(7)
    df = _mk(
        [
            (i, int(rng.integers(0, 5)), int(rng.integers(1, 50)))
            for i in range(200)
        ]
    )
    for budget in (0, 1, 137, 900, 2500, 10**9):
        assert _run(df, budget) == _brute(df, budget), budget


def test_budget_boundary_tie_group(ray_session):
    # every row shares one score: the whole corpus IS the tie group,
    # so selection is purely the id-ordered prefix
    df = _mk([(i, 3, 10) for i in range(50)])
    assert _run(df, 95) == set(range(9))  # 9 * 10 = 90 <= 95 < 100
    assert _run(df, 100) == set(range(10))


def test_budget_bucketed_boundary_path(ray_session, monkeypatch):
    # force the order-preserving id-bucket shrink path and pin it to
    # the direct-pull answer
    monkeypatch.setattr(B, "_BOUNDARY_PULL_LIMIT", 8)
    monkeypatch.setattr(B, "_BOUNDARY_BUCKETS", 4)
    rng = np.random.default_rng(11)
    df = _mk(
        [
            (i, int(rng.integers(0, 3)), int(rng.integers(1, 20)))
            for i in range(120)
        ]
    )
    for budget in (40, 333, 700):
        assert _run(df, budget) == _brute(df, budget), budget


def test_budget_whole_corpus_fits(ray_session):
    df = _mk([(i, i % 2, 5) for i in range(20)])
    assert _run(df, 100) == set(range(20))


def test_budget_negative_raises(ray_session):
    df = _mk([(1, 1, 1)])
    import ray.data

    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError):
        B.select_token_budget(ds, -1, "score", "tokens")
