"""Unigram-LM perplexity family (ops/lm.py): distributed train+score
parity with the single-process reference, OOV / max_vocab truncation,
empty-doc handling, bucket edges and corpus-quantile cut points."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def lm_docs(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    common = "the a of and to in is it for on".split()
    rare = [f"rare{i}" for i in range(30)]
    rows = []
    for i in range(80):
        toks = list(rng.choice(common, size=30))
        if i % 4 == 0:  # every 4th doc carries rare-word mass
            toks += list(rng.choice(rare, size=8))
        rows.append({"doc_id": i, "text": " ".join(toks)})
    rows.append({"doc_id": 900, "text": ""})  # empty doc
    rows.append({"doc_id": 901, "text": "   "})  # whitespace-only doc
    return rows


def _ray_scored(rows, **train_kw):
    import ray.data

    from fetch_engines_ray.ops.lm import score_perplexity, train_unigram_lm

    ds = ray.data.from_pandas(pd.DataFrame(rows))
    lm = train_unigram_lm(ds, **train_kw)
    out = (
        score_perplexity(ds, lm)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return lm, out


def test_train_score_matches_reference(lm_docs):
    from fetch_engines_ray.ops.lm import perplexity_reference

    _, out = _ray_scored(lm_docs)
    texts = [r["text"] for r in sorted(lm_docs, key=lambda r: r["doc_id"])]
    ref = perplexity_reference(texts)
    got = list(zip(out["lm_token_count"].astype(int), out["lm_logprob_micro"].astype(int)))
    assert got == ref


def test_max_vocab_truncation_matches_reference(lm_docs):
    from fetch_engines_ray.ops.lm import OOV, perplexity_reference

    lm, out = _ray_scored(lm_docs, max_vocab=10)
    # 10 kept words + the OOV row, which aggregates all dropped mass
    assert lm.num_rows == 11
    words = lm["word"].to_pylist()
    assert OOV in words
    texts = [r["text"] for r in sorted(lm_docs, key=lambda r: r["doc_id"])]
    ref = perplexity_reference(texts, max_vocab=10)
    got = list(zip(out["lm_token_count"].astype(int), out["lm_logprob_micro"].astype(int)))
    assert got == ref
    # rare words fell out of the top-10 vocab -> OOV logprob dominates
    # those docs and pushes their mean negative logprob strictly higher
    mean_neg = (-out["lm_logprob_micro"]) // out["lm_token_count"].clip(lower=1)
    by_id = dict(zip(out["doc_id"], mean_neg))
    rare_docs = [i for i in range(80) if i % 4 == 0]
    plain_docs = [i for i in range(80) if i % 4 != 0]
    assert min(by_id[i] for i in rare_docs) > max(by_id[i] for i in plain_docs)


def test_bounded_train_matches_full_table_cut(ray_session):
    """vocab >> max_vocab: the bounded (per-batch top-N + tail sentinel)
    train path must keep the IDENTICAL vocabulary and exact OOV mass as
    cutting the full count table — pinned row-for-row on the LM table."""
    import ray.data

    from fetch_engines_ray.ops.lm import OOV, train_unigram_lm

    rng = np.random.RandomState(11)
    rows = []
    for i in range(64):
        # zipf-ish: low word ids appear in many docs, high ids are rare
        toks = [f"w{int(v)}" for v in rng.zipf(1.3, size=40) if v < 5000]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(8)

    full = train_unigram_lm(ds, max_vocab=None)
    assert full.num_rows > 33  # corpus vocab genuinely exceeds the cap
    bounded = train_unigram_lm(ds, max_vocab=32)
    assert bounded.num_rows == 33

    # reproduce the cut on the full table in-process
    pdf = full.to_pandas()
    pdf = pdf[pdf["word"] != OOV]
    pdf = pdf.sort_values(["n", "word"], ascending=[False, True]).reset_index(drop=True)
    kept, dropped = pdf.iloc[:32], pdf.iloc[32:]
    want_words = sorted(kept["word"].tolist() + [OOV])
    assert bounded["word"].to_pylist() == want_words
    got = dict(zip(bounded["word"].to_pylist(), bounded["n"].to_pylist()))
    assert got[OOV] == int(dropped["n"].sum())  # exact OOV tail mass
    for w, n in zip(kept["word"], kept["n"]):
        assert got[w] == int(n)


def test_empty_docs_bucket_empty(lm_docs):
    _, out = _ray_scored(lm_docs)
    empty = out[out["doc_id"] >= 900]
    assert (empty["lm_token_count"] == 0).all()
    assert (empty["lm_logprob_micro"] == 0).all()
    assert (empty["ppl_bucket"] == "empty").all()


def test_lm_table_is_proper_distribution(ray_session, lm_docs):
    import ray.data

    from fetch_engines_ray.ops.lm import train_unigram_lm

    ds = ray.data.from_pandas(pd.DataFrame(lm_docs))
    for kw in ({}, {"max_vocab": 5}):
        lm = train_unigram_lm(ds, **kw)
        ns = lm["n"].to_numpy(zero_copy_only=False)
        total = ns.sum()
        v = lm.num_rows - 1  # minus OOV row
        alpha = 0.5
        denom = total + alpha * (v + 1)
        p = (ns + alpha) / denom
        # the v+1 smoothing types are exactly the table rows (kept vocab
        # + the OOV aggregate), so the table is a proper distribution
        assert lm.num_rows == v + 1
        assert abs(p.sum() - 1.0) < 1e-9


def test_bucket_edges(ray_session):
    import pyarrow as pa

    from fetch_engines_ray.ops.lm import score_perplexity

    # hand-built LM: one word with logp exactly -3_500_000 micro-nats
    lm = pa.table(
        {
            "word": ["w", "\x00oov"],
            "n": pa.array([1, 0], type=pa.int64()),
            "logp_micro": pa.array([-3_500_000, -9_000_000], type=pa.int64()),
        }
    ).sort_by("word")
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0, 1], "text": ["w w w", "unknown"]})
    )
    out = (
        score_perplexity(ds, lm, buckets=(3_500_001, 9_000_001))
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 0: mean_neg = 3_500_000 < 3_500_001 -> head
    assert out.iloc[0]["ppl_bucket"] == "head"
    assert int(out.iloc[0]["lm_logprob_micro"]) == -10_500_000
    # doc 1: OOV mean_neg = 9_000_000 -> middle under (…, 9_000_001)
    assert out.iloc[1]["ppl_bucket"] == "middle"


def test_mean_neg_quantiles(ray_session, lm_docs):
    import ray.data

    from fetch_engines_ray.ops.lm import (
        mean_neg_quantiles,
        score_perplexity,
        train_unigram_lm,
    )

    ds = ray.data.from_pandas(pd.DataFrame(lm_docs))
    scored = score_perplexity(ds, train_unigram_lm(ds))
    q = mean_neg_quantiles(scored, qs=(1 / 3, 2 / 3))
    pdf = scored.to_pandas()
    mean_neg = np.where(
        pdf["lm_token_count"] > 0,
        (-pdf["lm_logprob_micro"]) // pdf["lm_token_count"].clip(lower=1),
        0,
    )
    expect = [int(np.sort(mean_neg)[min(len(mean_neg) - 1, int(f * len(mean_neg)))]) for f in (1 / 3, 2 / 3)]
    assert q == expect


def test_floor_micro_quantization_matches_duckdb():
    """The exact-integer oracle contract: floor(ln(p)*1e6) must agree
    between Python math.log (train-time) and DuckDB ln (oracle)."""
    import duckdb

    con = duckdb.connect()
    vals = [(n + 0.5) / (1000 + 0.5 * 32) for n in range(1, 400)]
    got = con.execute(
        "SELECT CAST(floor(ln(x) * 1000000) AS BIGINT) FROM (SELECT unnest(?) AS x)",
        [vals],
    ).fetchall()
    want = [int(math.floor(math.log(v) * 1_000_000)) for v in vals]
    assert [g[0] for g in got] == want


def test_nul_prefixed_tokens_are_reserved_and_excluded(ray_session):
    """A crawl token spelled exactly like the OOV sentinel must not
    create a second OOV row (the floor lookup then resolved to the
    corpus word's logp — review finding); NUL-prefixed tokens are
    excluded from every statistic by contract."""
    import pandas as pd

    import ray.data
    from fetch_engines_ray.ops.lm import OOV, train_unigram_lm

    rows = [
        {"doc_id": 0, "text": "the \x00oov cat sat on the mat"},
        {"doc_id": 1, "text": "the cat ran"},
    ]
    lm = train_unigram_lm(ray.data.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert (lm["word"] == OOV).sum() == 1
    assert "\x00oov" not in set(lm[lm["word"] != OOV]["word"])


def test_train_unigram_lm_empty_corpus_raises_cleanly(ray_session):
    import pandas as pd
    import pytest

    import ray.data
    from fetch_engines_ray.ops.lm import train_unigram_lm

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]})).filter(
        lambda r: False
    )
    with pytest.raises(ValueError, match="empty corpus"):
        train_unigram_lm(ds)
    with pytest.raises(ValueError, match="empty corpus"):
        train_unigram_lm(ds, max_vocab=10)
