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
