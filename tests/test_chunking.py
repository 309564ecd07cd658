"""Sliding-window document chunking: boundary math, overlap semantics,
token conservation, id coverage, and embed-pipeline integration."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.chunking import chunk_batch, chunk_documents


def _mk(texts):
    return pa.Table.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _words(n, tag="w"):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_boundary_counts():
    out = chunk_batch(
        _mk([_words(10), _words(16), _words(17), _words(33), ""]),
        max_tokens=16,
        overlap=4,
    ).to_pandas()
    by = out.groupby("doc_id")["chunk_idx"].count()
    # stride 12: 10 tokens -> 1; 16 -> 1; 17 -> 2; 33 -> 1+ceil(17/12)=3
    assert by.tolist() == [1, 1, 2, 3, 1]
    assert (out["n_chunks"] == out.groupby("doc_id")["chunk_idx"].transform("count")).all()
    empty = out[out["doc_id"] == 4]
    assert empty["text"].tolist() == [""] and empty["n_tokens"].tolist() == [0]


def test_overlap_and_conservation():
    n, mt, ov = 100, 16, 4
    out = chunk_batch(_mk([_words(n)]), max_tokens=mt, overlap=ov).to_pandas()
    chunks = out.sort_values("chunk_idx")["text"].tolist()
    # consecutive chunks share exactly `ov` tokens
    for a, b in zip(chunks, chunks[1:]):
        assert a.split()[-ov:] == b.split()[:ov]
    # zero overlap conserves the token sequence exactly
    out0 = chunk_batch(_mk([_words(n)]), max_tokens=mt, overlap=0).to_pandas()
    joined = " ".join(out0.sort_values("chunk_idx")["text"])
    assert joined == _words(n)
    assert out0["n_tokens"].sum() == n


def test_every_token_covered_and_lengths():
    out = chunk_batch(_mk([_words(57)]), max_tokens=10, overlap=3).to_pandas()
    assert (out["n_tokens"] <= 10).all()
    # union of windows covers all 57 tokens
    seen = set()
    for t in out["text"]:
        seen.update(t.split())
    assert len(seen) == 57


def test_streaming_and_embed_integration(ray_session):
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [_words(500, "a"), _words(30, "b")],
            }
        )
    )
    chunks = chunk_documents(docs, max_tokens=64, overlap=8)
    df = chunks.to_pandas()
    assert set(df["doc_id"]) == {1, 2}
    assert df[df["doc_id"] == 2]["n_chunks"].iloc[0] == 1

    from fetch_engines_ray.ops.embed import embed_texts

    # chunk rows embed directly; (doc_id, chunk_idx) is the vector key
    emb = embed_texts(chunks, dim=16, id_col="doc_id").to_pandas()
    assert len(emb) == len(df)
    assert len(emb["embedding"].iloc[0]) == 16


def test_bad_overlap_rejected():
    with pytest.raises(ValueError):
        chunk_batch(_mk(["x"]), max_tokens=8, overlap=8)


def test_chunk_key_pack_roundtrip():
    from fetch_engines_ray.ops.chunking import pack_chunk_id, unpack_chunk_id

    for d, c in [(0, 0), (7, 3), (10**9, 1048575), (42, 1)]:
        k = pack_chunk_id(d, c)
        dd, cc = unpack_chunk_id(k)
        assert (int(dd), int(cc)) == (d, c)
    arr_d = np.array([1, 2, 3], dtype=np.int64)
    arr_c = np.array([0, 5, 9], dtype=np.int64)
    ks = pack_chunk_id(arr_d, arr_c)
    dd, cc = unpack_chunk_id(ks)
    assert dd.tolist() == [1, 2, 3] and cc.tolist() == [0, 5, 9]


def test_long_doc_retrieval_via_chunks(ray_session):
    """The composition the chunker exists for: a topic buried deep in a
    long document is findable through chunk-level vectors (and resolves
    back to the parent doc) where the whole-doc embedding dilutes it."""
    from fetch_engines_ray.ops.chunking import (
        add_chunk_key,
        chunk_documents,
        pack_chunk_id,
        resolve_chunk_hits,
    )
    from fetch_engines_ray.ops.embed import embed_texts
    from fetch_engines_ray.ops.similarity import knn_bruteforce

    rng = np.random.RandomState(11)
    filler_words = [f"f{i:03d}" for i in range(400)]
    topic = "quantum flux capacitor resonance"

    def filler(n):
        return " ".join(rng.choice(filler_words, size=n))

    # doc 3 buries the topic ~75% in; docs 0-5 are long filler
    docs = []
    for i in range(6):
        body = filler(600)
        if i == 3:
            words = body.split()
            words[450:450] = (topic + " ") * 6
            words = " ".join(words).split()
            body = " ".join(words)
        docs.append({"doc_id": i, "text": body})
    docs.append({"doc_id": 999, "text": topic})  # the query as its own doc
    ds = ray.data.from_pandas(pd.DataFrame(docs))

    chunks = chunk_documents(ds, max_tokens=64, overlap=8).map_batches(
        add_chunk_key, batch_format="pyarrow", batch_size=4096
    )
    emb = embed_texts(chunks, dim=32, id_col="chunk_key")
    qkey = int(pack_chunk_id(999, 0))
    hits = knn_bruteforce(emb, [qkey], k=8, id_col="chunk_key")
    hits = hits.rename(columns={"neighbor_id": "chunk_key"})
    resolved = resolve_chunk_hits(hits, k=3)
    assert resolved.iloc[0]["doc_id"] == 3  # parent doc wins
    assert resolved.iloc[0]["rank"] == 1
    # one row per doc even though doc 3 contributed multiple chunk hits
    assert resolved["doc_id"].is_unique


def test_pack_chunk_id_overflow_is_loud():
    """Full-range 64-bit hash ids would wrap the packed chunk key and
    resolve search hits to the WRONG parent doc — must raise (review
    finding)."""
    import numpy as np
    import pytest

    from fetch_engines_ray.ops.chunking import pack_chunk_id, unpack_chunk_id

    # in-range round-trips stay exact
    d, c = pack_chunk_id(np.int64(2**42), 7), None
    assert unpack_chunk_id(d) == (2**42, 7)
    with pytest.raises(ValueError, match="packable range"):
        pack_chunk_id(np.int64(2**43), 0)
    with pytest.raises(ValueError, match="chunk_idx"):
        pack_chunk_id(5, 1 << 20)
