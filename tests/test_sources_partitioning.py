"""Sources/sinks (SURVEY.md §2.1 S1/S2/S6/S7 analogs), size-aware
partitioning (§4.2), and route overrides (C10 / per-request knobs)."""

import json
import os

import pyarrow as pa
import pytest

from fetch_engines_ray.corpus.generate import INPUT_SCHEMA, make_doc


@pytest.fixture(scope="module")
def small_corpus_dir(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    rows = [make_doc(i, 42) for i in range(40)]
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(rows, schema=INPUT_SCHEMA), str(out / "part0.parquet"))
    return str(out)


def test_read_html_dir_roundtrip(ray_session, tmp_path):
    from fetch_engines_ray.sources import read_html_dir

    d = tmp_path / "html"
    (d / "sub").mkdir(parents=True)
    (d / "a.html").write_text("<html><body><main><h1>Alpha</h1><p>Body text here.</p></main></body></html>")
    (d / "sub" / "b.htm").write_text("<html><body><main><h1>Beta</h1><p>More text.</p></main></body></html>")
    ds = read_html_dir(str(d))
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == ["a.html", os.path.join("sub", "b.htm")]
    assert rows[0]["spans"][0]["kind"] == "html"
    assert "Alpha" in rows[0]["spans"][0]["text"]


def test_read_jsonl_docs_both_shapes(ray_session, tmp_path):
    from fetch_engines_ray.sources import read_jsonl_docs

    p = tmp_path / "docs.jsonl"
    recs = [
        {"doc_id": "x", "html": "<p>plain html record</p>", "base_url": "https://e.com/x"},
        {
            "doc_id": "y",
            "spans": [
                {"kind": "html", "text": "<p>spanned</p>", "offset": 0},
                {"kind": "image", "media_ref": "m/1.png", "offset": 1},
            ],
        },
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs))
    rows = {r["doc_id"]: r for r in read_jsonl_docs(str(p)).take_all()}
    assert rows["x"]["base_url"] == "https://e.com/x"
    assert len(rows["y"]["spans"]) == 2
    assert rows["y"]["spans"][1]["media_ref"] == "m/1.png"


def test_markdown_tree_sink(ray_session, small_corpus_dir, tmp_path):
    from fetch_engines_ray.pipelines.extract import extract_corpus
    from fetch_engines_ray.sources import write_markdown_tree

    out = tmp_path / "md"
    n = write_markdown_tree(extract_corpus(small_corpus_dir), str(out))
    files = [f for f in os.listdir(out) if f.endswith(".md")]
    assert n == 40 and len(files) == 40
    assert any(os.path.getsize(out / f) > 0 for f in files)


def test_eval_report_sink(ray_session, small_corpus_dir, tmp_path):
    from fetch_engines_ray.pipelines.extract import extract_corpus
    from fetch_engines_ray.sources import write_eval_report

    path = str(tmp_path / "report.json")
    report = write_eval_report(extract_corpus(small_corpus_dir), path)
    assert os.path.exists(path)
    assert report["overall"]["n_docs"] == 40
    assert 0.0 <= report["overall"]["pass_rate"] <= 1.0
    assert set(report["archetypes"])  # at least one archetype bucket
    # gate verdicts mirror the reference's nightly thresholds
    # (auto-render-cases.ts:23-25, applied in eval-auto-render.mjs:42-61)
    gates = report["gates"]
    assert gates["thresholds"] == {
        "gated_pass_rate": 0.8,
        "gated_static_pass_rate": 1.0,
        "gated_spa_pass_rate": 0.5,
    }
    assert 0 < gates["gated_cases"] <= 40
    assert set(gates["gate_pass"]) == {"gated", "static", "spa"}
    # the synthetic corpus is designed to clear every gate: challenge
    # dead-letters are ungated known-hard cases, everything else extracts
    assert gates["gates_passed"] is True, gates


def test_add_doc_bytes_matches_python(ray_session, small_corpus_dir):
    import ray.data

    from fetch_engines_ray.ops.partitioning import add_doc_bytes

    ds = ray.data.read_parquet(small_corpus_dir).map_batches(
        add_doc_bytes, batch_format="pyarrow", batch_size=16
    )
    for r in ds.take(10):
        expected = sum(len((s["text"] or "").encode()) for s in r["spans"])
        assert r["doc_bytes"] == expected


def test_size_aware_repartition_counts(ray_session, small_corpus_dir):
    import ray.data

    from fetch_engines_ray.ops.partitioning import size_aware_repartition

    ds = ray.data.read_parquet(small_corpus_dir)
    out = size_aware_repartition(ds, target_bytes=64 * 1024)
    mat = out.materialize()
    assert mat.count() == 40  # no rows lost
    assert mat.num_blocks() >= 2  # 40 docs of ~6KB >> 64KB target → split


def test_range_partition_by_doc_id(ray_session, small_corpus_dir):
    import ray.data

    from fetch_engines_ray.ops.partitioning import range_partition_by_doc_id

    ds = ray.data.read_parquet(small_corpus_dir)
    out = range_partition_by_doc_id(ds, 4).materialize()
    assert out.count() == 40
    assert out.num_blocks() == 4
    # contiguous, globally sorted doc_id ranges: per-block [min, max]
    # intervals must not overlap and concatenated ids must be sorted
    ids_per_block = [
        [r["doc_id"] for r in ref.to_pylist()]
        for ref in [ray.get(b) for b in out.get_internal_block_refs()]
        if len(ref)
    ]
    flat = [i for blk in ids_per_block for i in blk]
    assert flat == sorted(flat)
    bounds = [(blk[0], blk[-1]) for blk in ids_per_block]
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo


def test_route_override_patterns(ray_session, small_corpus_dir):
    from fetch_engines_ray.pipelines.extract import PipelineConfig, extract_corpus

    base = extract_corpus(small_corpus_dir).to_pandas().set_index("doc_id")
    forced = (
        extract_corpus(
            small_corpus_dir, PipelineConfig(warm_url_patterns=("example",))
        )
        .to_pandas()
        .set_index("doc_id")
    )
    # every doc whose base_url contains "example" must now be warm
    assert (forced["route"] == "warm").all() or (forced["route"] != base["route"]).any()
    assert (forced.loc[base["route"] == "warm", "route"] == "warm").all()


def test_force_route_column(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from fetch_engines_ray.pipelines.extract import PipelineConfig, build_pipeline

    rows = [make_doc(i, 42) for i in range(12)]
    t = pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)
    t = t.append_column("force_route", pa.array(["warm"] * 12))
    pq.write_table(t, str(tmp_path / "c.parquet"))
    cfg = PipelineConfig(
        read_columns=("doc_id", "spans", "archetype", "base_url", "force_route")
    )
    ds = ray.data.read_parquet(str(tmp_path), columns=list(cfg.read_columns))
    out = build_pipeline(ds, cfg).to_pandas()
    assert (out["route"] == "warm").all()


def test_export_shards_deterministic_and_sql_mirrored(ray_session, tmp_path):
    """Seeded shard export: assignment and within-shard order mirror the
    DuckDB md5 formula exactly, shards are hive-partitioned dirs, and a
    re-export is byte-stable (same rows, same order per shard)."""
    import duckdb
    import pandas as pd

    import ray.data

    from fetch_engines_ray.ops.partitioning import export_shards

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    for run in ("a", "b"):
        export_shards(ds, str(tmp_path / run), n_shards=4, seed=7)

    con = duckdb.connect()
    want = con.execute(
        f"SELECT doc_id, ('0x' || substr(md5('7:' || doc_id), 1, 8))::BIGINT % 4 AS shard,"
        f" ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT AS shuffle_key"
        f" FROM read_parquet('{sf}/documents.parquet')"
    ).df()

    frames = {}
    for run in ("a", "b"):
        shard_dirs = sorted((tmp_path / run).glob("shard=*"))
        assert len(shard_dirs) == 4
        per_shard = []
        for d in shard_dirs:
            # read in file order, preserving written row order
            dfs = [pd.read_parquet(f) for f in sorted(d.glob("*.parquet"))]
            df = pd.concat(dfs, ignore_index=True)
            df["shard"] = int(d.name.split("=")[1])
            per_shard.append(df)
        frames[run] = pd.concat(per_shard, ignore_index=True)

    # determinism: two exports produce identical content and order
    pd.testing.assert_frame_equal(frames["a"], frames["b"])
    got = frames["a"]
    merged = got.merge(want, on="doc_id", suffixes=("", "_sql"))
    assert (merged["shard"] == merged["shard_sql"]).all()
    assert (merged["shuffle_key"] == merged["shuffle_key_sql"]).all()
    # within every shard the written order is the shuffle_key order
    for _, g in got.groupby("shard"):
        assert g["shuffle_key"].is_monotonic_increasing
    # every shard non-empty at 500 docs / 4 shards
    assert got.groupby("shard").size().min() > 0


def test_warc_reader_roundtrip(ray_session, tmp_path):
    """WARC ingestion: plain and multi-member-gzip files parse to the
    corpus schema, non-response / non-HTML / non-2xx records are
    skipped, base_url carries the target URI, and the documents flow
    straight through the extraction pipeline."""
    import gzip

    from fetch_engines_ray.pipelines.extract import build_pipeline
    from fetch_engines_ray.sources.io import CORPUS_SCHEMA
    from fetch_engines_ray.sources.warc import read_warc, write_warc

    records = [
        {"url": "https://ex.com/a", "html": "<html><head><title>A</title></head>"
         "<body><main><h1>Doc A</h1><p>alpha beta gamma delta content here</p>"
         "</main></body></html>"},
        {"url": "https://ex.com/req", "html": "GET / HTTP/1.1", "warc_type": "request"},
        {"url": "https://ex.com/png", "html": "notanimage", "content_type": "image/png"},
        {"url": "https://ex.com/404", "html": "<html>gone</html>", "status": 404},
        {"url": "https://ex.com/b", "html": "<html><body><article><h2>Doc B</h2>"
         "<p>zeta eta theta iota kappa words</p></article></body></html>"},
    ]
    write_warc(records, str(tmp_path / "shard0.warc"))
    write_warc(records, str(tmp_path / "shard1.warc.gz"), gz=True)
    # the .gz really is multi-member (one gzip stream per record)
    raw = (tmp_path / "shard1.warc.gz").read_bytes()
    assert raw.count(b"\x1f\x8b\x08") >= len(records)

    for fname in ("shard0.warc", "shard1.warc.gz"):
        ds = read_warc(str(tmp_path / fname))
        assert ds.schema().names == CORPUS_SCHEMA.names
        rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
        # only the two 2xx text/html responses survive
        assert [r["base_url"] for r in rows] == ["https://ex.com/a", "https://ex.com/b"]
        assert rows[0]["doc_id"] == f"{fname}:0"
        assert "Doc A" in rows[0]["spans"][0]["text"]
        # and they extract end-to-end through the flagship pipeline
        out = build_pipeline(read_warc(str(tmp_path / fname))).take_all()
        assert len(out) == 2
        texts = {r["doc_id"]: "".join(s["text"] for s in r["out_spans"]) for r in out}
        assert "Doc A" in texts[f"{fname}:0"]
        assert "Doc B" in texts[f"{fname}:4"]


def test_archive_reader_zip_and_tar(ray_session, tmp_path):
    """Archive ingestion: zip and tar.gz bundles of HTML files parse to
    the corpus schema, non-HTML members are skipped, container format
    is sniffed by magic, and the documents extract end-to-end."""
    import io as _io
    import tarfile
    import zipfile

    from fetch_engines_ray.pipelines.extract import build_pipeline
    from fetch_engines_ray.sources.archive import read_archive
    from fetch_engines_ray.sources.io import CORPUS_SCHEMA

    pages = {
        "site/a.html": "<html><head><title>A</title></head><body><main>"
        "<h1>Doc A</h1><p>alpha beta gamma delta content here</p></main></body></html>",
        "site/b.htm": "<html><body><article><h2>Doc B</h2>"
        "<p>zeta eta theta iota kappa words</p></article></body></html>",
        "site/skip.css": "body { color: red }",
        "site/skip.png": "notanimage",
    }
    with zipfile.ZipFile(tmp_path / "bundle.zip", "w") as zf:
        for name, text in pages.items():
            zf.writestr(name, text)
    with tarfile.open(tmp_path / "bundle.tar.gz", "w:gz") as tf:
        for name, text in pages.items():
            data = text.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))

    for fname in ("bundle.zip", "bundle.tar.gz"):
        ds = read_archive(str(tmp_path / fname))
        assert ds.schema().names == CORPUS_SCHEMA.names
        rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in rows] == [
            f"{fname}:site/a.html",
            f"{fname}:site/b.htm",
        ]
        out = build_pipeline(read_archive(str(tmp_path / fname))).take_all()
        texts = {r["doc_id"]: "".join(s["text"] for s in r["out_spans"]) for r in out}
        assert "Doc A" in texts[f"{fname}:site/a.html"]
        assert "Doc B" in texts[f"{fname}:site/b.htm"]


def test_warc_wire_codings_decoded(ray_session, tmp_path):
    """Crawl archives store raw wire bytes: chunked transfer coding and
    gzip/deflate content codings must be stripped before HTML reaches
    the corpus. Also covers the pure _dechunk edge cases."""
    import pytest as _pytest

    from fetch_engines_ray.sources.warc import (
        WarcFormatError,
        _dechunk,
        read_warc,
        write_warc,
    )

    html = ("<html><body><main><h1>Wire</h1><p>alpha beta gamma delta epsilon"
            "</p></main></body></html>")
    records = [
        {"url": "https://ex.com/chunked", "html": html,
         "transfer_encoding": "chunked"},
        {"url": "https://ex.com/gz", "html": html, "content_encoding": "gzip"},
        {"url": "https://ex.com/both", "html": html,
         "transfer_encoding": "chunked", "content_encoding": "gzip"},
        {"url": "https://ex.com/plain", "html": html},
    ]
    write_warc(records, str(tmp_path / "wire.warc"))
    rows = sorted(
        read_warc(str(tmp_path / "wire.warc")).take_all(), key=lambda r: r["doc_id"]
    )
    assert len(rows) == 4
    for r in rows:
        assert r["spans"][0]["text"] == html  # every coding fully undone

    # chunk extensions are tolerated; truncation and junk raise
    assert _dechunk(b"5;ext=1\r\nhello\r\n0\r\n\r\n") == b"hello"
    with _pytest.raises(WarcFormatError):
        _dechunk(b"5\r\nhel")
    with _pytest.raises(WarcFormatError):
        _dechunk(b"zz\r\nhello\r\n0\r\n\r\n")


def test_warc_and_archive_skip_corrupt_inputs(ray_session, tmp_path):
    """Real crawl deliveries contain junk: malformed records skip the
    record, corrupt files skip the file — the job never dies."""
    import tarfile

    from fetch_engines_ray.sources.archive import read_archive
    from fetch_engines_ray.sources.warc import read_warc, write_warc

    good = {"url": "https://ex.com/ok", "html": "<html><body><main><h1>OK</h1>"
            "<p>alpha beta gamma delta content</p></main></body></html>"}
    bad_status = {"url": "https://ex.com/bad", "html": "<html>x</html>"}
    write_warc([good, bad_status, good], str(tmp_path / "mixed.warc"))
    raw = (tmp_path / "mixed.warc").read_bytes()
    # corrupt the middle record's status to a SAME-LENGTH non-numeric
    # token (record framing intact -> later records must still parse)
    raw = raw.replace(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: 14",
                      b"HTTP/1.1 2x0 OK\r\nContent-Type: text/html\r\nContent-Length: 14")
    (tmp_path / "mixed.warc").write_bytes(raw)
    # a gzip-magic file that is NOT valid gzip, plus a truncated tail file
    (tmp_path / "corrupt.warc").write_bytes(b"\x1f\x8b\x08junkjunkjunk")
    rows = read_warc(str(tmp_path)).take_all()
    assert [r["base_url"] for r in sorted(rows, key=lambda r: r["doc_id"])] == [
        "https://ex.com/ok", "https://ex.com/ok"]

    # archives: one good zip + one stray non-archive file in the dir
    import zipfile
    with zipfile.ZipFile(tmp_path / "a.zip", "w") as zf:
        zf.writestr("p.html", good["html"])
    (tmp_path / "README.txt").write_text("not an archive")
    (tmp_path / "trunc.tar").write_bytes(b"\x00" * 100)
    out = read_archive([str(tmp_path / "a.zip"), str(tmp_path / "README.txt"),
                        str(tmp_path / "trunc.tar")]).take_all()
    assert len(out) == 1 and out[0]["doc_id"] == "a.zip:p.html"
