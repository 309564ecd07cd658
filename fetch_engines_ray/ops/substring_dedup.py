"""Cross-document repeated-substring detection (ExactSubstr-lite).

Public-knowledge basis: Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022) deduplicates EXACT substrings of
>= 50 tokens with a corpus-wide suffix array; a suffix array over 100 TB
is not a Ray-shaped structure, so this module implements the standard
distributed approximation: winnowing fingerprints (Schleimer et al.,
SIGMOD 2003 — already the engine's whole-doc fingerprint kernel) keyed
by POSITION, a wide pass to find fingerprints shared across >= min_docs
documents, and a per-document merge of consecutive shared fingerprints
into repeated SPANS.  Winnowing guarantees any shared passage of at
least ``k + window - 1`` tokens shares at least one selected
fingerprint, so long duplicated passages (license boilerplate, mirrored
articles, templated headers) are always flagged; sub-window snippets can
be missed — the documented recall/cost dial.

Ray-Data shape:

- fingerprinting is one stateless ``map_batches`` pass emitting
  ``(doc_id, pos, fp)`` rows;
- "shared by >= min_docs docs" is two small groupby rollups over the
  fingerprint table (distinct (fp, doc) first, then per-fp doc counts —
  one row per distinct fingerprint crosses the second shuffle);
- span assembly joins the (tiny) repeated-fp set back via hash
  semi-join, then hash-partitions by doc id and merges spans with ONE
  vectorized pandas pass per partition (the line-dedup lesson: never
  ``map_groups`` per doc — ~2 ms dispatch per group).
"""
from __future__ import annotations

import zlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray

_B = 1000003  # rolling base (same constants as add_winnowing_fingerprint)
_MOD = (1 << 61) - 1


def _winnow_positions(toks: list[str], k: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed k-gram selections WITH positions: returns (pos, fp)."""
    if len(toks) < k:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    th = np.array([zlib.crc32(w.encode()) for w in toks], dtype=np.int64)
    n = len(toks) - k + 1
    powers = [pow(_B, k - 1 - j, _MOD) for j in range(k)]
    acc = np.zeros(n, dtype=object)
    for j in range(k):
        acc = (acc + th[j : j + n].astype(object) * powers[j]) % _MOD
    acc = acc.astype(np.int64)
    if n <= window:
        p = int(acc.argmin())
        return np.array([p], dtype=np.int64), acc[[p]]
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(acc, window)
    pos = w.argmin(axis=1) + np.arange(n - window + 1)
    sel = np.unique(pos)
    return sel.astype(np.int64), acc[sel]


def fingerprint_positions(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> "ray.data.Dataset":
    """One stateless pass: ``(doc_id, pos:int64, fp:int64)`` winnowed
    fingerprint rows (pos = token index where the k-gram starts)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_out: list = []
        pos_out: list[np.ndarray] = []
        fp_out: list[np.ndarray] = []
        ids = batch[id_col].to_pylist()
        for i, t in enumerate(batch[text_col].to_pylist()):
            pos, fps = _winnow_positions((t or "").lower().split(), k, window)
            ids_out.extend([ids[i]] * len(pos))
            pos_out.append(pos)
            fp_out.append(fps)
        pos_all = np.concatenate(pos_out) if pos_out else np.empty(0, dtype=np.int64)
        fp_all = np.concatenate(fp_out) if fp_out else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids_out),
                "pos": pa.array(pos_all, type=pa.int64()),
                "fp": pa.array(fp_all, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=1024)


def repeated_fingerprints(
    fps: "ray.data.Dataset", id_col: str = "doc_id", min_docs: int = 2
) -> "ray.data.Dataset":
    """Fingerprints appearing in >= ``min_docs`` DISTINCT documents:
    two groupby rollups (distinct (fp, doc) pairs, then per-fp doc
    counts).  Returns ``(fp, n_docs)``."""
    from ray.data.aggregate import Count

    distinct = fps.groupby(["fp", id_col]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    counts = distinct.groupby("fp").aggregate(Count(alias_name="n_docs"))
    return counts.filter(expr=f"n_docs >= {int(min_docs)}")


def repeated_spans(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_docs: int = 2,
    merge_gap: int | None = None,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-document repeated spans: ``(doc_id, start_pos, end_pos,
    n_shared_fps)`` where [start_pos, end_pos] covers token k-gram
    starts whose fingerprints are shared with other documents, merged
    when consecutive selections are within ``merge_gap`` positions
    (default ``k + window`` — adjacent selections of one passage).

    A shared passage of >= k + window - 1 tokens always yields at least
    one span in every document carrying it (winnowing guarantee)."""
    import ray

    merge_gap = merge_gap if merge_gap is not None else k + window
    fps = fingerprint_positions(ds, text_col, id_col, k, window)
    # the fingerprint table is consumed twice (rollup + semi-join):
    # checkpoint once, same rationale as the minhash signature table
    from fetch_engines_ray.ops.dedup import _checkpoint_parquet, _cleanup_checkpoint

    fps_ckpt, ckpt = _checkpoint_parquet(fps, "substr_fps")
    try:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "start_pos": pd.Series(dtype="int64"),
                "end_pos": pd.Series(dtype="int64"),
                "n_shared_fps": pd.Series(dtype="int64"),
            }
        )
        n_rows = fps_ckpt.count()  # metadata-only on the checkpoint
        if n_parts is None:
            n_parts = max(2, min(64, n_rows // 500_000 + 1))
        # materialized: the repeated-fp set is bounded by DUPLICATED
        # content (not corpus size) and is consumed by count + join —
        # materializing avoids re-running both rollups
        shared = (
            repeated_fingerprints(fps_ckpt, id_col, min_docs)
            .drop_columns(["n_docs"])
            .materialize()
        )
        if n_rows == 0 or shared.count() == 0:
            # no fingerprints at all / nothing repeated: a join against
            # the schema-less empty stream would die (see dedup's
            # _consume_pairs) — short-circuit to the typed empty result
            # (from_arrow: ray keeps an Arrow block's schema on empty
            # datasets where from_pandas drops it)
            return ray.data.from_arrow(pa.Table.from_pandas(empty))
        # semi-join via the engine's guarded partitioned merge, NOT a
        # raw Ray hash join: the shared-fp side is SPARSE (bounded by
        # duplicated content), and any join partition whose hash range
        # holds no shared fp would receive a schema-less empty table and
        # die with ArrowInvalid — the normal case for lightly-duplicated
        # corpora (see dedup._partitioned_attach's documented failure
        # mode; only the fully-empty case is short-circuited above)
        from fetch_engines_ray.ops.dedup import _partitioned_attach

        def add_flag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "flag", pa.array(np.ones(len(b), dtype=bool))
            )

        hits = _partitioned_attach(
            fps_ckpt,
            shared.map_batches(add_flag, batch_format="pyarrow", batch_size=65536),
            key_col="fp",
            carry=[(id_col, pa.int64()), ("pos", pa.int64())],
            value_col="flag",
            value_type=pa.bool_(),
            out_col="shared_flag",
            n_parts=n_parts,
            how="inner",
            lookup_key="fp",
        )

        def to_parts(batch: pa.Table) -> pa.Table:
            ids = batch[id_col]
            part = pd.util.hash_array(np.asarray(ids.to_pylist(), dtype=object)) % np.uint64(64)
            return batch.append_column("part", pa.array(part.astype(np.int64)))

        def merge_part(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values([id_col, "pos"])
            ids = g[id_col].to_numpy()
            pos = g["pos"].to_numpy()
            # a new span starts at a doc change or a gap > merge_gap
            new_doc = np.ones(len(g), dtype=bool)
            new_doc[1:] = (ids[1:] != ids[:-1]) | (np.diff(pos) > merge_gap)
            span_id = np.cumsum(new_doc) - 1
            out = (
                pd.DataFrame({id_col: ids, "pos": pos, "span": span_id})
                .groupby("span", sort=True)
                .agg(
                    **{
                        id_col: (id_col, "first"),
                        "start_pos": ("pos", "min"),
                        "end_pos": ("pos", "max"),
                        "n_shared_fps": ("pos", "size"),
                    }
                )
                .reset_index(drop=True)
            )
            out["n_shared_fps"] = out["n_shared_fps"].astype("int64")
            return out

        spans = (
            hits.map_batches(to_parts, batch_format="pyarrow", batch_size=8192)
            .groupby("part")
            .map_groups(merge_part, batch_format="pandas")
        )
        # consume before the checkpoint cleanup: the span table is
        # bounded by repeated CONTENT, not corpus size (at a scale where
        # even that is too big for the driver, set FER_KEEP_CHECKPOINTS
        # and stream `hits` span assembly straight to a parquet sink)
        out = spans.to_pandas()
        if out.empty:
            return ray.data.from_arrow(pa.Table.from_pandas(empty))
        return ray.data.from_pandas(
            out.sort_values([id_col, "start_pos"]).reset_index(drop=True)
        )
    finally:
        _cleanup_checkpoint(ckpt)


def repeated_spans_reference(
    docs: list[tuple[int, str]],
    k: int = 5,
    window: int = 4,
    min_docs: int = 2,
    merge_gap: int | None = None,
) -> pd.DataFrame:
    """Single-process reference (pytest parity pin)."""
    merge_gap = merge_gap if merge_gap is not None else k + window
    rows = []
    for d, t in docs:
        pos, fps = _winnow_positions((t or "").lower().split(), k, window)
        rows.extend((d, int(p), int(f)) for p, f in zip(pos, fps))
    df = pd.DataFrame(rows, columns=["doc_id", "pos", "fp"])
    docs_per_fp = df.groupby("fp")["doc_id"].nunique()
    shared = set(docs_per_fp[docs_per_fp >= min_docs].index)
    hit = df[df["fp"].isin(shared)].sort_values(["doc_id", "pos"])
    out = []
    for d, g in hit.groupby("doc_id"):
        pos = g["pos"].to_numpy()
        start = pos[0]
        prev = pos[0]
        n = 1
        for p in pos[1:]:
            if p - prev > merge_gap:
                out.append((d, int(start), int(prev), n))
                start, n = p, 0
            prev = p
            n += 1
        out.append((d, int(start), int(prev), n))
    return pd.DataFrame(out, columns=["doc_id", "start_pos", "end_pos", "n_shared_fps"])
