"""Product quantization (ops/pq.py): codes are m bytes, ADC search
clears a recall floor against exact brute force, reconstruction error
improves with codebook capacity, and everything is deterministic."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def trained(emb_ds):
    from fetch_engines_ray.ops.pq import pq_encode, pq_train

    cb = pq_train(emb_ds, m=8, ksub=64, seed=13)
    codes = pq_encode(emb_ds, cb).materialize()
    return cb, codes


def test_code_shape_and_compression(trained):
    cb, codes = trained
    assert cb.shape == (8, 64, 8)  # 64-dim embeddings, m=8
    rows = codes.take(5)
    for r in rows:
        assert len(r["pq_code"]) == 8  # 8 bytes vs 256 B float32 raw


def test_pq_recall_against_bruteforce(emb_ds, trained):
    from fetch_engines_ray.ops.pq import pq_search
    from fetch_engines_ray.ops.similarity import knn_bruteforce

    cb, codes = trained
    qids = [0, 1, 2, 3]
    qvecs = np.asarray(
        [r["embedding"] for r in emb_ds.filter(expr="vec_id < 4").take_all()],
        dtype=np.float64,
    )
    approx = pq_search(codes, cb, qvecs, qids, k=10)
    exact = knn_bruteforce(emb_ds, query_ids=qids, k=10)
    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # no self matches, exactly k results per query
    assert (approx["query_id"] != approx["neighbor_id"]).all()
    assert approx.groupby("query_id").size().tolist() == [10] * 4


def test_more_capacity_lowers_reconstruction_error(emb_ds):
    from fetch_engines_ray.ops.pq import pq_reconstruction_error, pq_train

    small = pq_train(emb_ds, m=8, ksub=4, seed=13)
    big = pq_train(emb_ds, m=8, ksub=64, seed=13)
    e_small = pq_reconstruction_error(emb_ds, small)
    e_big = pq_reconstruction_error(emb_ds, big)
    assert e_big < e_small
    assert e_big >= 0.0


def test_training_and_encoding_deterministic(emb_ds):
    from fetch_engines_ray.ops.pq import pq_encode, pq_train

    a = pq_train(emb_ds, m=8, ksub=16, seed=13)
    b = pq_train(emb_ds, m=8, ksub=16, seed=13)
    assert np.array_equal(a, b)
    ca = pq_encode(emb_ds, a).to_pandas().sort_values("vec_id")
    cb = pq_encode(emb_ds, b).to_pandas().sort_values("vec_id")
    assert ca["pq_code"].tolist() == cb["pq_code"].tolist()


def test_dim_not_divisible_raises(emb_ds):
    from fetch_engines_ray.ops.pq import pq_train

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb_ds, m=7)


def test_exact_recovery_when_corpus_is_codebook(ray_session):
    """If the corpus has <= ksub distinct subvector patterns, Lloyd's
    places a centroid on each and ADC ranks exactly like brute force."""
    import ray.data

    from fetch_engines_ray.ops.pq import pq_encode, pq_search, pq_train
    from fetch_engines_ray.ops.similarity import knn_bruteforce

    rng = np.random.RandomState(2)
    protos = rng.randn(6, 16)
    rows = []
    for i in range(60):
        v = protos[i % 6]
        rows.append({"vec_id": i, "embedding": (v / np.linalg.norm(v)).tolist()})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    cb = pq_train(ds, m=4, ksub=8, seed=13)
    codes = pq_encode(ds, cb)
    q = np.asarray([rows[0]["embedding"]])
    out = pq_search(codes, cb, q, [0], k=9)
    # the 9 other copies of proto 0 are the exact top-9 and PQ finds them
    want = {6 * j for j in range(1, 10)}
    assert set(out["neighbor_id"]) == want


def test_pq_search_never_returns_self_even_when_corpus_smaller_than_k(ray_session):
    """With fewer than k non-self rows, the -inf self row used to
    survive the cut and the query matched its own id (review finding);
    boundary ties now resolve (sim desc, id asc) like knn_bruteforce."""
    import numpy as np

    import ray.data
    from fetch_engines_ray.ops.pq import pq_encode, pq_search, pq_train

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(5, 8))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(5)]
    ds = ray.data.from_items(rows)
    cb = pq_train(ds, m=4, ksub=4, sample_size=5)
    codes = pq_encode(ds, cb)
    out = pq_search(codes, cb, vecs[[0]], [0], k=10)
    assert (out["neighbor_id"] != 0).all()
    assert len(out) == 4  # all non-self rows, never the query itself


def test_pq_search_tie_break_is_partition_invariant(ray_session):
    """Duplicate vectors share PQ codes and tie EXACTLY: the block-level
    cut must order ties (sim desc, id asc) so the result does not
    change with block splits (review finding)."""
    import numpy as np

    import ray.data
    from fetch_engines_ray.ops.pq import pq_encode, pq_search, pq_train

    base = np.eye(8)[:4]
    rows = []
    for rep in range(6):
        for j in range(4):
            rows.append({"vec_id": rep * 4 + j, "embedding": base[j].tolist()})
    ds1 = ray.data.from_items(rows)
    ds13 = ray.data.from_items(rows).repartition(13)
    cb = pq_train(ds1, m=4, ksub=4, sample_size=32)
    q = base[[0]]
    a = pq_search(pq_encode(ds1, cb), cb, q, [0], k=5)["neighbor_id"].tolist()
    b = pq_search(pq_encode(ds13, cb), cb, q, [0], k=5)["neighbor_id"].tolist()
    assert a == b
