"""Arrow schema hygiene for Ray Data blocks.

Parquet files written through pandas (the driver's test tables, and any
checkpoint that round-tripped a pandas stage) carry a ``pandas`` JSON
blob in the Arrow schema metadata.  ``hash(pyarrow.Schema)`` raises
``unhashable type: 'dict'`` on any schema with metadata, which defeats
Ray Data's block-schema deduplication (``unify_schemas`` falls back to
per-block schema serialization) and spams every run log with
``Failed to hash the schemas (for deduplication)`` warnings from the
first map stage after each read (seen in BENCH_r03.json on
``MapBatches(to_exact)`` and ``_pack_batch``).

The fix is one zero-copy whole-block pass dropping the metadata at the
read: ``replace_schema_metadata(None)`` rebuilds only the schema object,
and ``batch_size=None`` hands each input block through untouched, so
the batcher never concatenates (and therefore never unify-hashes)
metadata-carrying blocks.
"""
from __future__ import annotations

import pyarrow as pa

import ray.data


def _strip_meta(block: pa.Table) -> pa.Table:
    return block.replace_schema_metadata(None)


def strip_schema_metadata(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Drop Arrow schema metadata from every block (zero-copy)."""
    return ds.map_batches(_strip_meta, batch_format="pyarrow", batch_size=None)


def _clean_read_schema(paths, columns):
    """A metadata-free, column-projected schema for ``read_parquet``'s
    ``schema=`` argument, derived from the first local parquet file —
    this kills the unhashable-metadata problem INSIDE the read operator
    (``ReadParquet->SplitBlocks`` unify-hashes block schemas before any
    downstream stage can strip them).  Returns None when it cannot be
    derived safely (remote paths, hive-partition columns not present in
    the file), in which case the strip stage still covers every stage
    after the read."""
    import os

    import pyarrow.parquet as pq

    path = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        if os.path.isdir(path):
            files = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
            if not files:
                return None
            path = files[0]
        schema = pq.read_schema(path)
    except Exception:
        return None
    if columns is not None:
        if any(c not in schema.names for c in columns):
            return None  # e.g. hive partition columns live in the path
        schema = pa.schema([schema.field(c) for c in columns])
    return schema.remove_metadata()


def read_parquet_clean(paths, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` + schema-metadata hygiene — the
    engine's standard parquet entry point (see module docstring)."""
    if "schema" not in kwargs:
        schema = _clean_read_schema(paths, kwargs.get("columns"))
        if schema is not None:
            kwargs["schema"] = schema
    return strip_schema_metadata(ray.data.read_parquet(paths, **kwargs))
