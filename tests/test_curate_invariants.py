"""End-to-end curation invariant: a replicated corpus collapses to the
IDENTICAL packed output.

The re-crawl scenario — the same corpus ingested k times with distinct
ids — must yield byte-for-byte the same curated dataset as one copy:
exact + MinHash near-dedup and SemDeDup remove every replica before the
downstream gates, so perplexity cut, DSIR selection and packing all see
the same survivor set.  (The 10x version of this check at sf0.1 scale
is recorded in BASELINE.md: 284 sequences out of both corpora.)
"""
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _replicate(t: pa.Table, id_col: str, k: int) -> pa.Table:
    parts = []
    for r in range(k):
        parts.append(
            t.set_column(
                t.schema.get_field_index(id_col),
                id_col,
                pc.add(t[id_col], r * 1_000_000),
            )
        )
    return pa.concat_tables(parts)


def test_curate_replica_collapse(ray_session):
    import ray.data

    from fetch_engines_ray.pipelines.curate import curate_corpus

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    emb = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    texts = docs["text"].to_pylist()
    bench_texts = texts[:4]
    target = texts[:16]

    def run(dt: pa.Table, et: pa.Table) -> list:
        packed = curate_corpus(
            ray.data.from_arrow(dt).repartition(4),
            max_tokens=256,
            benchmark_texts=bench_texts,
            embeddings=ray.data.from_arrow(et).repartition(4),
            semdedup_eps=0.95,
            dsir_target_texts=target,
            dsir_n=100,
            ppl_tail_quantile=0.05,
        ).to_pandas()
        return sorted(
            tuple(int(i) for i in ids) for ids in packed["doc_ids"].tolist()
        )

    one = run(docs, emb)
    three = run(_replicate(docs, "doc_id", 3), _replicate(emb, "vec_id", 3))
    assert one, "curation produced no sequences"
    assert one == three
