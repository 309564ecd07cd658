"""``ray job submit`` entry point for the flagship extraction pipeline
(SURVEY.md §7.2 M6).

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/job_entry.py --input /data/corpus --output /data/out \
        --resumable

Locally (sandbox) it runs the same thing against a local session.  The
script owns the Ray session (the library never calls ray.init); with
``--resumable`` the run is partition-atomic with lineage sidecars, so
re-submitting after a failure skips finished fragments.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus parquet dir/file")
    ap.add_argument("--output", required=True, help="output dir (parquet)")
    ap.add_argument("--resumable", action="store_true", help="partition-atomic lineage run")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-content-length", type=int, default=None)
    ap.add_argument(
        "--datacard",
        default=None,
        metavar="PATH",
        help="also write a markdown corpus datacard (profile + basic "
        "gates) over the extraction output to PATH",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone it starts a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from fetch_engines_ray.pipelines.extract import (
        PipelineConfig,
        extract_corpus,
        run_resumable,
    )

    cfg = PipelineConfig(max_content_length=args.max_content_length)
    t0 = time.perf_counter()
    if args.resumable:
        n = run_resumable(args.input, args.output, cfg, concurrency=args.concurrency)
    else:
        ds = extract_corpus(args.input, cfg)
        ds.write_parquet(args.output)
        n = None
    wall = time.perf_counter() - t0
    card = None
    if args.datacard:
        import ray.data

        from fetch_engines_ray.ops import expectations as ex
        from fetch_engines_ray.ops.datacard import write_datacard

        out_ds = ray.data.read_parquet(args.output)
        write_datacard(
            args.datacard,
            out_ds,
            name=os.path.basename(args.output.rstrip("/")) or args.output,
            columns=["doc_id", "title", "route", "quality_score"],
            checks=[ex.not_null("doc_id"), ex.unique("doc_id"), ex.row_count(1, 10**15)],
        )
        card = args.datacard
    print(
        json.dumps(
            {"output": args.output, "wall_sec": round(wall, 3), "fragments": n, "datacard": card}
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
