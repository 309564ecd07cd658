"""Single-core converter profiling + output-equivalence harness.

Runs the full extraction path (routing + converter chain + serializer)
over the deterministic profile corpus WITHOUT Ray, prints wall time and
an md5 over every document's output spans — any converter change must
keep the md5 identical (or consciously regenerate goldens).

Usage:
  python scripts/profile_convert.py            # time + md5
  python scripts/profile_convert.py --profile  # cProfile top-30
  python scripts/profile_convert.py --docs 500 # subset
"""

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CORPUS = "/tmp/fer_prof_corpus"


def load_rows(n_docs):
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(os.listdir(CORPUS)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(CORPUS, f))
        rows.extend(t.to_pylist())
        if n_docs and len(rows) >= n_docs:
            break
    return rows[:n_docs] if n_docs else rows


def run(rows):
    """Returns (cpu_seconds, md5).  CPU time (time.process_time), not
    wall: this host has multi-minute noise phases where identical work
    takes up to 2.5x the wall clock, but CPU consumed per unit of work
    stays flat — A/B comparisons need the latter."""
    from fetch_engines_ray.stages.extract import DocumentExtractor

    ex = DocumentExtractor()
    h = hashlib.md5()
    t0 = time.process_time()
    for r in rows:
        out = ex.extract_document(
            r["doc_id"], r["spans"], r.get("base_url") or None, r.get("archetype", "")
        )
        for s in out["out_spans"]:
            h.update(
                f"{r['doc_id']}|{s['kind']}|{s['text']}|{s['media_ref']}|{s['order']}\n".encode()
            )
    dt = time.process_time() - t0
    return dt, h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--docs", type=int, default=0)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    marker = os.path.join(CORPUS, "_COMPLETE")
    if not os.path.exists(marker):
        # regenerate on a missing MARKER, not a missing dir: an
        # interrupted first generation leaves a partial corpus that
        # would silently change the md5 equivalence contract
        import shutil

        from fetch_engines_ray.corpus.generate import generate_corpus

        shutil.rmtree(CORPUS, ignore_errors=True)
        generate_corpus(CORPUS, num_docs=2250, seed=7)
        with open(marker, "w") as f:
            f.write("ok")

    rows = load_rows(args.docs)
    if args.profile:
        import cProfile
        import io
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        dt, digest = run(rows)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(30)
        print(s.getvalue())
        print(f"{len(rows)} docs in {dt:.2f}s  md5={digest}")
        return
    best = None
    for _ in range(args.repeat):
        dt, digest = run(rows)
        best = dt if best is None else min(best, dt)
        print(f"{len(rows)} docs in {dt:.2f}s  md5={digest}")
    if args.repeat > 1:
        print(f"best: {best:.2f}s")


if __name__ == "__main__":
    main()
