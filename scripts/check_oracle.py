"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB (row count + schema + order-insensitive value comparison)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # round BEFORE sorting: sub-1e-6 engine/oracle float noise can
    # order two near-equal rows differently on the two sides, which
    # then flags a spurious diff on the other columns
    for c in df.columns:
        if df[c].dtype.kind in "fiu" or str(df[c].dtype).startswith(("Int", "UInt", "Float")):
            df[c] = df[c].astype("float64").round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def dtype_mismatches(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """int-vs-float dtype drift between engine and oracle columns.

    The external gate hashes raw value representations, so an engine
    int64 against an oracle float64 hash-fails even when the numbers are
    equal (DuckDB HUGEINT->float64 did exactly this three times across
    rounds 1-2: doc_stats_by_lang, user_sessions, large_parts_by_brand).
    ``norm()`` casts both sides to float64 and hides the class — this
    check runs BEFORE normalization so the sweep fails loudly instead.
    """
    bad = []
    for c in sorted(set(got.columns) & set(want.columns)):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} <= {"i", "u", "f"} and (gk in "iu") != (wk in "iu"):
            bad.append(f"{c}: engine {got[c].dtype} vs oracle {want[c].dtype}")
    return bad


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.print_on_execution_start = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:] or None
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown query name(s): {unknown}", file=sys.stderr)
            sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"ERROR  {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows   {name}: {len(got)} rows in {dt:.1f}s (no oracle)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        dt_bad = dtype_mismatches(got, want)
        if dt_bad:
            print(f"FAIL   {name}: int/float dtype drift — {'; '.join(dt_bad)}")
            failures.append(name)
            continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"FAIL   {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures.append(name)
        elif len(g) != len(w):
            print(f"FAIL   {name}: rows {len(g)} != {len(w)}")
            failures.append(name)
        elif not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"FAIL   {name}: {neq.sum()} differing rows of {len(g)}")
            print(pd.concat([g[neq].head(3), w[neq].head(3)], keys=["got", "want"]))
            failures.append(name)
        else:
            print(f"OK     {name}: {len(g)} rows in {dt:.1f}s")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries consistent with oracle")


if __name__ == "__main__":
    main()
