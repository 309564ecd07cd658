"""Capstone integration: the CONTINUOUS ingest loop a production corpus
runs day over day, composed entirely from the engine's own pieces.

    day 1: WARC crawl → extraction → documents → quality gates →
           minhash signature checkpoint → curate → search index
    day 2: new WARC batch (overlapping re-crawls + fresh pages) →
           incremental dedup vs the persisted checkpoint →
           drift report day1 vs day2 → index append → hybrid query

Each piece is pinned by its own suite; this test pins the SEAMS:
id-space consistency across batches, checkpoint reuse without
recompute, and the monitoring hooks firing on planted shifts."""

import numpy as np
import pandas as pd
import pytest

from fetch_engines_ray.pipelines.ingest import ingest_corpus
from fetch_engines_ray.sources.warc import read_warc, write_warc


def _pages(ids, seed, words, size=(60, 90)):
    rng = np.random.RandomState(seed)
    recs = []
    for i in ids:
        body = " ".join(rng.choice(words, size=rng.randint(*size)))
        recs.append(
            {
                "url": f"https://ex.com/p{i}",
                "html": f"<html><head><title>P{i}</title></head><body><main>"
                f"<h1>Page {i}</h1><p>{body}</p></main></body></html>",
            }
        )
    return recs


STOP = "the be to of and that have with".split()
WORDS_DAY1 = STOP + [f"word{i:03d}xx" for i in range(40)]
WORDS_DAY2 = STOP + [f"neue{i:03d}yy" for i in range(40)]  # vocabulary shift


def test_continuous_ingest_loop(ray_session, tmp_path):
    import ray.data

    from fetch_engines_ray.ops import expectations as ex
    from fetch_engines_ray.ops.dedup import (
        build_minhash_checkpoint,
        minhash_incremental_pairs,
    )
    from fetch_engines_ray.ops.drift import drift_report

    # ---- day 1 ----
    day1 = _pages(range(10), seed=4, words=WORDS_DAY1)
    write_warc(day1, str(tmp_path / "day1.warc"))
    docs1 = ingest_corpus(read_warc(str(tmp_path / "day1.warc")))
    # quality gates between extraction and everything downstream
    ex.enforce(
        docs1,
        [ex.not_null("text"), ex.unique("doc_int_id"), ex.row_count(10, 10)],
    )
    t1 = docs1.to_pandas()

    # persist the signature index (the cross-day dedup state)
    ckpt = str(tmp_path / "sigs")
    sig_view = docs1.select_columns(["doc_int_id", "text"]).rename_columns(
        {"doc_int_id": "doc_id"}
    )
    build_minhash_checkpoint(sig_view, ckpt)

    # ---- day 2: 3 exact re-crawls of day-1 pages + 7 fresh pages with
    # a shifted vocabulary ----
    recrawl = [dict(r) for r in day1[:3]]
    fresh = _pages(range(100, 107), seed=9, words=WORDS_DAY2)
    write_warc(recrawl + fresh, str(tmp_path / "day2.warc"))
    docs2 = ingest_corpus(read_warc(str(tmp_path / "day2.warc")))
    t2 = docs2.to_pandas()

    # incremental dedup: new batch vs checkpoint WITHOUT recomputing
    # day 1 — the 3 re-crawls pair with their day-1 twins at est 1.0
    new_view = docs2.select_columns(["doc_int_id", "text"]).rename_columns(
        {"doc_int_id": "doc_id"}
    )
    pairs = minhash_incremental_pairs(new_view, ckpt, persist_new=True)
    day1_ids = set(t1["doc_int_id"])
    day2_ids = set(t2["doc_int_id"])
    cross = pairs[
        (pairs["doc_a"].isin(day1_ids) & pairs["doc_b"].isin(day2_ids))
        | (pairs["doc_a"].isin(day2_ids) & pairs["doc_b"].isin(day1_ids))
    ]
    perfect = cross[cross["est_jaccard"] >= 0.999]
    assert len(perfect) >= 3  # every re-crawl found against the index
    # fresh pages never pair with day 1
    fresh_ids = {
        i
        for d, i in zip(t2["doc_id"], t2["doc_int_id"])
        if int(d.split(":")[-1]) >= 3
    }
    assert not (
        set(perfect["doc_a"]).union(perfect["doc_b"]) & fresh_ids
    )

    # drift monitoring over the ingest schema: n_chars numeric profile,
    # base_url as the categorical source mix (fresh pages keep the same
    # host, so the categorical side stays calm while numeric may move)
    rep = drift_report(
        docs1,
        docs2,
        numeric_cols=["n_chars"],
        categorical_cols=["base_url"],
        n_buckets=5,
    )
    assert set(rep["column"]) == {"n_chars", "base_url"}
    assert (rep["psi"] >= 0.0).all()

    # ---- searchable artifact across both days: build on day 1, append
    # day 2 WITHOUT refit, query for a day-2 phrase ----
    from fetch_engines_ray.ops.ann_index import append_ivfpq_index
    from fetch_engines_ray.ops.embed import embed_texts
    from fetch_engines_ray.pipelines.search import build_search_index, hybrid_search

    idx = str(tmp_path / "idx")
    build_search_index(
        docs1, idx, n_clusters=4, pq_m=8, pq_ksub=16, id_col="doc_int_id"
    )
    emb2 = embed_texts(docs2, id_col="doc_int_id")
    total = append_ivfpq_index(emb2, idx)
    assert total == len(t1) + len(t2)

    all_docs = docs1.union(docs2)
    probe_word = WORDS_DAY2[10]
    hits = hybrid_search(
        all_docs, idx, probe_word, k=5, nprobe=4, id_col="doc_int_id"
    )
    assert len(hits) > 0
    # the day-2 vocabulary word only matches day-2 (appended) documents
    # on the keyword side, so they must surface in the fused ranks
    # (the fused id column carries the CALLER'S id_col name — it used
    # to be mislabeled "doc_id" regardless of id_col)
    assert set(hits["doc_int_id"]) & fresh_ids
