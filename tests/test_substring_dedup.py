"""Cross-document repeated-substring detection (ops/substring_dedup.py):
the winnowing guarantee holds for planted shared passages, spans match
the single-process reference exactly, and clean corpora return typed
empty results."""

import numpy as np
import pandas as pd
import pytest


def _docs():
    rng = np.random.RandomState(17)
    vocab = [f"w{i:03d}" for i in range(400)]
    passage = " ".join(f"boiler{j:02d}" for j in range(40))  # 40-token shared passage
    docs = []
    for i in range(12):
        body = " ".join(rng.choice(vocab, size=80))
        docs.append((i, body))
    # docs 20/21/22 carry the SAME 40-token passage at different offsets
    docs.append((20, passage + " " + " ".join(rng.choice(vocab, size=60))))
    docs.append((21, " ".join(rng.choice(vocab, size=30)) + " " + passage))
    docs.append((22, " ".join(rng.choice(vocab, size=15)) + " " + passage + " " + " ".join(rng.choice(vocab, size=25))))
    return docs


@pytest.fixture(scope="module")
def spans_out(ray_session):
    import ray.data

    from fetch_engines_ray.ops.substring_dedup import repeated_spans

    docs = _docs()
    ds = ray.data.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    return docs, repeated_spans(ds).to_pandas()


def test_planted_passage_found_in_every_carrier(spans_out):
    docs, out = spans_out
    carriers = {20: 0, 21: 31, 22: 16}  # doc -> passage token offset
    for d, off in carriers.items():
        mine = out[out["doc_id"] == d]
        assert len(mine) >= 1, f"doc {d} has no repeated span"
        # at least one span must sit inside the 40-token passage
        # (k-gram starts range over [off, off+40-5])
        inside = mine[(mine["start_pos"] >= off) & (mine["end_pos"] <= off + 35)]
        assert len(inside) >= 1, (d, mine)
        # a long shared passage selects MANY fingerprints, not one
        assert inside["n_shared_fps"].max() >= 5


def test_random_docs_have_no_spans(spans_out):
    _, out = spans_out
    assert set(out["doc_id"]) == {20, 21, 22}


def test_matches_reference(spans_out):
    from fetch_engines_ray.ops.substring_dedup import repeated_spans_reference

    docs, out = spans_out
    ref = (
        repeated_spans_reference(docs)
        .sort_values(["doc_id", "start_pos"])
        .reset_index(drop=True)
    )
    got = out.sort_values(["doc_id", "start_pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref.astype("int64"), check_like=True
    )


def test_clean_corpus_returns_typed_empty(ray_session):
    import ray.data

    from fetch_engines_ray.ops.substring_dedup import repeated_spans

    rows = [
        {"doc_id": i, "text": " ".join(f"u{i}x{j}" for j in range(30))}
        for i in range(10)
    ]
    ds_out = repeated_spans(ray.data.from_pandas(pd.DataFrame(rows)))
    assert ds_out.count() == 0
    # ray's to_pandas drops columns on empty datasets; the Dataset-level
    # schema is the contract (kept via the from_arrow empty block)
    assert ds_out.schema().names == ["doc_id", "start_pos", "end_pos", "n_shared_fps"]


def test_winnowing_guarantee_minimum_length(ray_session):
    """A shared passage of exactly k + window - 1 tokens (the guarantee
    boundary) is still caught in both carriers."""
    import ray.data

    from fetch_engines_ray.ops.substring_dedup import repeated_spans

    shared = " ".join(f"g{j}" for j in range(8))  # k=5, window=4 -> 8 tokens
    rows = [
        {"doc_id": 0, "text": shared + " " + " ".join(f"a{j}" for j in range(40))},
        {"doc_id": 1, "text": " ".join(f"b{j}" for j in range(40)) + " " + shared},
        {"doc_id": 2, "text": " ".join(f"c{j}" for j in range(40))},
    ]
    out = repeated_spans(ray.data.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert set(out["doc_id"]) == {0, 1}
