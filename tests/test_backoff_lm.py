"""Stupid-Backoff n-gram LM (ops/backoff_lm.py): distributed train+score
parity with the independent single-process reference, exact count
tables, count cutoffs, bounded max_ngrams cut identity, backoff
ordering (seen context beats unseen), and empty-doc handling."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sb_docs(ray_session):
    rng = np.random.RandomState(13)
    common = "the a of and to in is it for on".split()
    phrase = "the quick brown fox jumps over the lazy dog".split()
    rows = []
    for i in range(60):
        toks = list(rng.choice(common, size=20))
        if i % 3 == 0:  # every 3rd doc repeats the natural phrase
            toks += phrase
        rows.append({"doc_id": i, "text": " ".join(toks)})
    # scrambled phrase docs: same unigrams, novel bigram/trigram contexts
    for i in range(100, 110):
        scr = list(phrase)
        rng.shuffle(scr)
        rows.append({"doc_id": i, "text": " ".join(scr)})
    # pure phrase docs: every context seen many times across the corpus
    for i in range(200, 210):
        rows.append({"doc_id": i, "text": " ".join(phrase)})
    rows.append({"doc_id": 900, "text": ""})
    rows.append({"doc_id": 901, "text": "   "})
    return rows


def _ray_scored(rows, order=3, **train_kw):
    import ray.data

    from fetch_engines_ray.ops.backoff_lm import score_backoff, train_backoff_lm

    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(6)
    lm = train_backoff_lm(ds, order=order, **train_kw)
    out = (
        score_backoff(ds, lm, order=order)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return lm, out


def _assert_parity(rows, out, **ref_kw):
    from fetch_engines_ray.ops.backoff_lm import backoff_reference

    texts = [r["text"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    ref = backoff_reference(texts, **ref_kw)
    assert out["sb_token_count"].astype(int).tolist() == [tc for tc, _ in ref]
    # per-token floor(ln·1e6) may differ by 1 ulp between numpy's
    # vectorized log and libm math.log -> allow 1 micro-nat per token
    for got, (tc, want) in zip(out["sb_logscore_micro"].astype(int), ref):
        assert abs(got - want) <= max(tc, 1)


def test_train_score_matches_reference(sb_docs):
    _, out = _ray_scored(sb_docs)
    _assert_parity(sb_docs, out, order=3)


def test_count_table_exact(sb_docs):
    from fetch_engines_ray.ops.backoff_lm import TOTAL_SENTINEL

    lm, _ = _ray_scored(sb_docs)
    want: Counter = Counter()
    total = 0
    for r in sb_docs:
        ws = r["text"].lower().split()
        total += len(ws)
        for k in (1, 2, 3):
            for i in range(len(ws) - k + 1):
                want[" ".join(ws[i : i + k])] += 1
    got = dict(zip(lm["ngram"].to_pylist(), lm["n"].to_pylist()))
    assert got.pop(TOTAL_SENTINEL) == total
    assert got == dict(want)
    # order column is the space count + 1
    for g, k in zip(lm["ngram"].to_pylist(), lm["k"].to_pylist()):
        if g != TOTAL_SENTINEL:
            assert k == g.count(" ") + 1


def test_min_count_cutoff(sb_docs):
    lm, out = _ray_scored(sb_docs, min_count=(1, 2, 2))
    ns = np.asarray(lm["n"].to_pylist())
    ks = np.asarray(lm["k"].to_pylist())
    assert (ns[ks >= 2] >= 2).all()  # cutoff applied to orders 2..3
    _assert_parity(sb_docs, out, order=3, min_count=(1, 2, 2))


def test_bounded_matches_full_cut(sb_docs):
    """max_ngrams: the bounded (per-block top-N) pull must keep the
    identical per-order n-gram set as cutting the full table."""
    lm_full, _ = _ray_scored(sb_docs)
    lm_cut, out = _ray_scored(sb_docs, max_ngrams=12)
    full = lm_full.to_pandas()
    cut = lm_cut.to_pandas()
    for k in (1, 2, 3):
        want = (
            full[full["k"] == k]
            .sort_values(["n", "ngram"], ascending=[False, True])
            .iloc[:12]["ngram"]
            .tolist()
        )
        assert sorted(cut[cut["k"] == k]["ngram"]) == sorted(want)
    _assert_parity(sb_docs, out, order=3, max_ngrams=12)


def test_seen_context_beats_scrambled(sb_docs):
    """The quality signal the op exists for: docs carrying the corpus's
    repeated phrase (seen trigrams) must score strictly better (lower
    sb_mean_neg) than the scrambled-phrase docs (same unigrams, novel
    contexts -> backoff penalties)."""
    _, out = _ray_scored(sb_docs)
    by_id = dict(zip(out["doc_id"], out["sb_mean_neg"]))
    pure = [by_id[i] for i in range(200, 210)]
    scrambled = [by_id[i] for i in range(100, 110)]
    assert max(pure) < min(scrambled)


def test_bigram_only_and_order1(sb_docs):
    from fetch_engines_ray.ops.lm import perplexity_reference

    _, out2 = _ray_scored(sb_docs, order=2)
    _assert_parity(sb_docs, out2, order=2)
    # order=1 degenerates to the add-alpha unigram LM (same base case)
    _, out1 = _ray_scored(sb_docs, order=1)
    texts = [r["text"] for r in sorted(sb_docs, key=lambda r: r["doc_id"])]
    uni = perplexity_reference(texts)
    for got, (tc, want) in zip(out1["sb_logscore_micro"].astype(int), uni):
        assert abs(got - want) <= max(tc, 1)


def test_empty_docs(sb_docs):
    _, out = _ray_scored(sb_docs)
    empty = out[out["doc_id"] >= 900]
    assert (empty["sb_token_count"] == 0).all()
    assert (empty["sb_logscore_micro"] == 0).all()
    assert (empty["sb_mean_neg"] == 0).all()


def test_total_sentinel_collision_is_impossible(ray_session):
    """A doc containing the literal token '\\x00total' must not inflate
    the corpus total N (review finding: engine vs reference diverged by
    2.6x on such a corpus).  NUL-prefixed tokens are excluded."""
    import pandas as pd

    import ray.data
    from fetch_engines_ray.ops.backoff_lm import (
        backoff_reference,
        score_backoff,
        train_backoff_lm,
    )

    rows = [
        {"doc_id": 0, "text": "the \x00total cat sat on the mat today"},
        {"doc_id": 1, "text": "the cat sat on the mat again now"},
    ]
    texts = [r["text"] for r in rows]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    model = train_backoff_lm(ds)
    got = (
        score_backoff(ds, model)
        .to_pandas()
        .sort_values("doc_id")["sb_logscore_micro"]
        .tolist()
    )
    want = [s for _d, s in backoff_reference(texts)]
    assert got == want
