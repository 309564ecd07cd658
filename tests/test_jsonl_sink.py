"""Sharded JSONL delivery: round-trip, determinism, atomic resume."""

import gzip
import json
import os

import pytest

import ray


def _corpus(n=40):
    return ray.data.from_items(
        [
            {"doc_id": i, "text": f"doc {i} bodyé", "lang": "en" if i % 2 else "fr"}
            for i in range(n)
        ]
    )


def _read_all(path):
    rows = []
    for f in sorted(os.listdir(path)):
        fp = os.path.join(path, f)
        if f.endswith(".jsonl"):
            opener = open
        elif f.endswith(".jsonl.gz"):
            opener = gzip.open
        else:
            continue
        with opener(fp, "rt", encoding="utf-8") as fh:
            rows.extend(json.loads(l) for l in fh if l.strip())
    return rows


def test_jsonl_shards_roundtrip_and_determinism(ray_session, tmp_path):
    from fetch_engines_ray.ops.jsonl_sink import read_jsonl_shards, write_jsonl_shards

    out = str(tmp_path / "a")
    m = write_jsonl_shards(_corpus(), out, n_shards=4, seed=7)
    assert m["n_rows"] == 40 and m["skipped_shards"] == 0
    rows = _read_all(out)
    assert sorted(r["doc_id"] for r in rows) == list(range(40))
    assert all(set(r) == {"doc_id", "text", "lang"} for r in rows)
    assert rows[0]["text"].endswith("é")  # force_ascii=False survives

    # byte-identical reproducibility: same seed → same shard bytes
    out2 = str(tmp_path / "b")
    write_jsonl_shards(_corpus(), out2, n_shards=4, seed=7)
    for f in sorted(os.listdir(out)):
        if f.endswith(".jsonl"):
            assert (
                open(os.path.join(out, f), "rb").read()
                == open(os.path.join(out2, f), "rb").read()
            )

    # distributed read-back sees every row
    back = read_jsonl_shards(out)
    assert sorted(r["doc_id"] for r in back.take_all()) == list(range(40))


def test_jsonl_shards_resume_skips_finished(ray_session, tmp_path):
    from fetch_engines_ray.ops.jsonl_sink import write_jsonl_shards

    out = str(tmp_path / "r")
    m1 = write_jsonl_shards(_corpus(), out, n_shards=4, seed=1)
    shards = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert len(shards) >= 2
    # simulate a killed run: delete ONE shard's data+meta
    victim = shards[0]
    os.remove(os.path.join(out, victim))
    os.remove(os.path.join(out, victim.replace(".jsonl", ".meta.json")))
    kept = shards[1]
    kept_mtime = os.path.getmtime(os.path.join(out, kept))
    m2 = write_jsonl_shards(_corpus(), out, n_shards=4, seed=1)
    assert m2["n_rows"] == m1["n_rows"]
    assert m2["skipped_shards"] == len(shards) - 1
    # finished shards were not rewritten
    assert os.path.getmtime(os.path.join(out, kept)) == kept_mtime
    assert os.path.exists(os.path.join(out, victim))


def test_jsonl_shards_gzip_reproducible(ray_session, tmp_path):
    from fetch_engines_ray.ops.jsonl_sink import read_jsonl_shards, write_jsonl_shards

    out = str(tmp_path / "g1")
    out2 = str(tmp_path / "g2")
    m = write_jsonl_shards(_corpus(12), out, n_shards=2, seed=3, compression="gzip")
    write_jsonl_shards(_corpus(12), out2, n_shards=2, seed=3, compression="gzip")
    assert m["n_rows"] == 12
    gz = sorted(f for f in os.listdir(out) if f.endswith(".jsonl.gz"))
    assert gz
    for f in gz:  # mtime=0 header → byte-identical archives
        assert (
            open(os.path.join(out, f), "rb").read()
            == open(os.path.join(out2, f), "rb").read()
        )
    assert sorted(r["doc_id"] for r in _read_all(out)) == list(range(12))
    back = read_jsonl_shards(out)
    assert back.count() == 12


def test_jsonl_shards_rejects_unknown_compression(ray_session, tmp_path):
    from fetch_engines_ray.ops.jsonl_sink import write_jsonl_shards

    with pytest.raises(ValueError):
        write_jsonl_shards(_corpus(4), str(tmp_path / "x"), compression="zstd")


def test_curate_jsonl_export_hook(ray_session, tmp_path):
    """curate_corpus(jsonl_export_path=...) ships the cleaned document
    table: one line per surviving doc, ids matching the packed output."""
    from fetch_engines_ray.pipelines.curate import curate_corpus

    import numpy as np

    rng = np.random.RandomState(21)
    stop = "the be to of and that have with".split()
    words = stop + [f"word{i:03d}xx" for i in range(50)]
    docs = [
        {"doc_id": i, "text": " ".join(rng.choice(words, size=rng.randint(60, 90)))}
        for i in range(30)
    ]
    docs.append({"doc_id": 100, "text": docs[0]["text"]})  # exact clone
    out = str(tmp_path / "jsonl")
    packed = curate_corpus(
        ray.data.from_items(docs),
        max_tokens=64,
        jsonl_export_path=out,
        n_shards=3,
    ).to_pandas()
    rows = _read_all(out)
    packed_ids = {d for ids in packed["doc_ids"] for d in ids}
    assert {r["doc_id"] for r in rows} == packed_ids
    assert 100 not in packed_ids  # the clone was deduped before export
    assert all(r["text"] for r in rows)


def test_jsonl_resume_refuses_config_change(ray_session, tmp_path):
    """Per-shard resume with a different n_shards/seed would silently
    mix stale and fresh shards — the sink must refuse (review
    finding)."""
    import pandas as pd
    import pytest

    import ray.data
    from fetch_engines_ray.ops.jsonl_sink import write_jsonl_shards

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(40), "text": [f"d{i}" for i in range(40)]})
    )
    p = str(tmp_path / "jl")
    write_jsonl_shards(ds, p, n_shards=8)
    # same config: resume skips cleanly
    m = write_jsonl_shards(ds, p, n_shards=8)
    assert m["skipped_shards"] == 8
    with pytest.raises(ValueError, match="fresh directory"):
        write_jsonl_shards(ds, p, n_shards=4)
    with pytest.raises(ValueError, match="fresh directory"):
        write_jsonl_shards(ds, p, n_shards=8, seed=99)
    # id_col keys the shard assignment too (assign_shards hashes it) —
    # resuming with a different id column must be refused the same way
    ds2 = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(40),
                "alt_id": range(100, 140),
                "text": [f"d{i}" for i in range(40)],
            }
        )
    )
    p2 = str(tmp_path / "jl2")
    write_jsonl_shards(ds2, p2, n_shards=8)
    with pytest.raises(ValueError, match="fresh directory"):
        write_jsonl_shards(ds2, p2, n_shards=8, id_col="alt_id")
