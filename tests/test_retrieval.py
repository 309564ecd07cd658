"""BM25 retrieval (ops/retrieval.py): exact parity with the
single-process reference, relevance ordering on planted docs,
partitioning invariance, and edge cases."""

import numpy as np
import pandas as pd
import pytest


def _corpus():
    rng = np.random.RandomState(23)
    filler = [f"f{i:03d}" for i in range(200)]
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choice(filler, size=50))))
    # planted relevance ladder for query "ray data engine":
    docs.append((100, "ray data engine " * 5 + " ".join(rng.choice(filler, size=30))))
    docs.append((101, "ray data " + " ".join(rng.choice(filler, size=48))))
    docs.append((102, "engine " + " ".join(rng.choice(filler, size=49))))
    return docs


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data

    return _corpus(), None


def _ds(docs):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))


def test_bm25_matches_reference(corpus_ds):
    from fetch_engines_ray.ops.retrieval import bm25_reference, bm25_topk

    docs, _ = corpus_ds
    got = bm25_topk(_ds(docs), "ray data engine", k=10)
    want = bm25_reference(docs, "ray data engine", k=10)
    pd.testing.assert_frame_equal(got, want)


def test_bm25_relevance_ordering(corpus_ds):
    from fetch_engines_ray.ops.retrieval import bm25_topk

    docs, _ = corpus_ds
    top = bm25_topk(_ds(docs), "ray data engine", k=5)
    # the all-terms doc wins; partial-match docs follow; no filler doc
    # outranks a planted one
    assert top.iloc[0]["doc_id"] == 100
    assert set(top.head(3)["doc_id"]) == {100, 101, 102}


def test_bm25_partitioning_invariant(corpus_ds):
    from fetch_engines_ray.ops.retrieval import bm25_topk

    docs, _ = corpus_ds
    a = bm25_topk(_ds(docs), "ray data engine", k=7)
    b = bm25_topk(_ds(docs).repartition(9), "ray data engine", k=7)
    pd.testing.assert_frame_equal(a, b)


def test_bm25_empty_query_and_no_hits(corpus_ds):
    from fetch_engines_ray.ops.retrieval import bm25_topk

    docs, _ = corpus_ds
    assert bm25_topk(_ds(docs), "   ", k=5).empty
    assert bm25_topk(_ds(docs), "zzz_not_in_corpus", k=5).empty


def test_bm25_rare_term_beats_common(ray_session):
    """idf does its job: a doc matching the RARE query term outranks a
    doc matching the common one."""
    from fetch_engines_ray.ops.retrieval import bm25_topk

    docs = [(i, "common " + f"x{i} y{i} z{i}") for i in range(20)]
    docs.append((50, "rareterm a b c"))
    top = bm25_topk(_ds(docs), "common rareterm", k=3)
    assert top.iloc[0]["doc_id"] == 50


def test_rrf_fusion_combines_keyword_and_vector(ray_session):
    """Hybrid retrieval: a doc ranked mid-list by BOTH systems outranks
    docs ranked top by only one (the RRF property), and the fusion of
    the engine's own bm25_topk + knn_bruteforce outputs runs end to
    end on the real testdata tables."""
    import ray.data

    from fetch_engines_ray.ops.retrieval import bm25_topk, rrf_fuse
    from fetch_engines_ray.ops.similarity import knn_bruteforce

    a = pd.DataFrame({"doc_id": [1, 2, 3], "rank": [1, 2, 3]})
    b = pd.DataFrame({"doc_id": [4, 2, 5], "rank": [1, 2, 3]})
    fused = rrf_fuse([a, b])
    assert fused.iloc[0]["doc_id"] == 2  # in both lists at rank 2
    assert int(fused.iloc[0]["rrf_score_x1e9"]) == 2 * round(1e9 / 62)

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = bm25_topk(docs, "the fast key", k=10)
    vec = knn_bruteforce(emb, query_ids=[0], k=10)
    fused2 = rrf_fuse([kw, vec])
    assert len(fused2) >= 10 and fused2["rank"].tolist() == list(range(1, len(fused2) + 1))


def test_bm25_stats_artifact_matches_oneshot(corpus_ds, tmp_path):
    """The persisted-stats path must return EXACTLY the one-shot result
    (shared scoring pass; dfs/avgdl from the artifact), with the term
    lookup read-pruned to the query terms' hash partitions."""
    from fetch_engines_ray.ops.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_stats,
        corpus_stats,
        load_bm25_stats,
    )

    docs, _ = corpus_ds
    path = str(tmp_path / "bm25_stats")
    meta = build_bm25_stats(_ds(docs), path, n_parts=16)
    assert meta["n_docs"] == len(docs)

    for query in ("ray data engine", "f000 f001", "missingterm ray"):
        want = bm25_topk(_ds(docs), query, k=10)
        got = bm25_topk_indexed(_ds(docs), path, query, k=10)
        pd.testing.assert_frame_equal(got, want)
        # artifact dfs == one-pass dfs for present terms; absent -> 0
        terms = sorted(set(query.lower().split()))
        dfs_live, n_docs, avgdl = corpus_stats(_ds(docs), terms)
        dfs_idx, n_docs_i, avgdl_i = load_bm25_stats(path, terms)
        assert n_docs_i == n_docs and abs(avgdl_i - avgdl) < 1e-12
        for t in terms:
            assert dfs_idx.get(t, 0) == dfs_live.get(t, 0)


def test_bm25_stats_min_df_prunes_tail(corpus_ds, tmp_path):
    """min_df drops tail terms from the artifact (df=0 at query time —
    the documented approximation for below-threshold terms)."""
    import os

    from fetch_engines_ray.ops.retrieval import build_bm25_stats, load_bm25_stats

    docs, _ = corpus_ds
    path = str(tmp_path / "bm25_stats_pruned")
    build_bm25_stats(_ds(docs), path, min_df=3, n_parts=8)
    # 'engine' appears in exactly 2 docs -> pruned; 'ray' in 2 docs -> pruned;
    # filler terms hit ~50*60/200 docs -> kept
    dfs, _, _ = load_bm25_stats(path, ["engine", "f000"])
    assert "engine" not in dfs
    assert dfs.get("f000", 0) >= 3
    # hive layout exists with <= n_parts part dirs
    parts = [d for d in os.listdir(path) if d.startswith("part=")]
    assert 1 <= len(parts) <= 8
