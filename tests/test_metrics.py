"""Metrics surface (IEngine.getMetrics() analog) and Lance sink guard."""

import pytest


def test_get_metrics_stages_and_cluster(ray_session):
    import ray.data

    from fetch_engines_ray.state.metrics import get_metrics

    ds = ray.data.range(5000).map_batches(lambda b: b).materialize()
    m = get_metrics(ds=ds)
    assert m["cluster"]["cpus_total"] >= 1
    assert m["cluster"]["nodes"] >= 1
    assert m["stages"], "executed dataset must expose per-operator stats"
    total_rows = sum(s["output_rows"] for s in m["stages"])
    assert total_rows >= 5000
    assert all("operator" in s and "wall_time_s" in s for s in m["stages"])


def test_lineage_metrics_from_resumable_run(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fetch_engines_ray.corpus.generate import INPUT_SCHEMA, make_doc
    from fetch_engines_ray.pipelines.extract import run_resumable
    from fetch_engines_ray.state.metrics import get_metrics

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    rows = [make_doc(i, 11) for i in range(20)]
    pq.write_table(pa.Table.from_pylist(rows[:10], schema=INPUT_SCHEMA), str(corpus / "a.parquet"))
    pq.write_table(pa.Table.from_pylist(rows[10:], schema=INPUT_SCHEMA), str(corpus / "b.parquet"))
    out_dir = str(tmp_path / "out")
    run_resumable(str(corpus), out_dir, concurrency=2)

    m = get_metrics(lineage_dir=out_dir)
    assert m["lineage"]["partitions"] == 2
    assert m["lineage"]["rows"] == 20
    assert m["lineage"]["wall_time_s_total"] > 0
    assert sum(m["lineage"]["route_counts"].values()) == 20


def test_lance_sink_guard(ray_session):
    import ray.data

    from fetch_engines_ray.sources import write_corpus_lance

    try:
        import lance  # noqa: F401

        has_lance = True
    except ImportError:
        has_lance = False
    ds = ray.data.range(3)
    if not has_lance:
        with pytest.raises(NotImplementedError, match="lance"):
            write_corpus_lance(ds, "/tmp/never_written.lance")
