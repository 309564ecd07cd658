"""Archive container source: zip / tar(.gz) bundles of HTML files →
corpus-shaped Dataset.

Crawl and scrape deliveries frequently arrive as archives-of-pages
(one member per page) rather than WARC; the reference ingests one URL
at a time (``/root/reference/src/FetchEngine.ts:83-165``), while at
100-TB scale the same pages arrive bundled.  Scale shape matches
``sources/warc.py``: ARCHIVES are the parallelism unit —
``ray.data.read_binary_files`` distributes whole-file reads across the
cluster and each map task opens its own archive with stdlib
``zipfile``/``tarfile`` in memory, so member bytes never flow through
the driver and the shard list partitions work exactly as published.

Only ``.html``/``.htm`` members become documents (the reference's
content-type gate analog, ``FetchEngine.ts:116-123``); other members
are skipped.  ``doc_id`` is ``<archive basename>:<member path>`` —
stable, unique, and resumable per delivery shard.
"""

from __future__ import annotations

import io
import os
import tarfile
import zipfile

import pyarrow as pa

import ray.data

from .io import CORPUS_SCHEMA, _doc_row


def _html_members_zip(data: bytes):
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir() or not info.filename.lower().endswith((".html", ".htm")):
                continue
            yield info.filename, zf.read(info)


def _html_members_tar(data: bytes):
    # mode "r:*" sniffs plain/gz/bz2/xz — and tolerates Ray having
    # already auto-decompressed a ".tar.gz" by extension
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for info in tf:
            if not info.isfile() or not info.name.lower().endswith((".html", ".htm")):
                continue
            f = tf.extractfile(info)
            if f is not None:
                yield info.name, f.read()


def read_archive(paths) -> "ray.data.Dataset":
    """Zip / tar archive file(s) or dir of archives → corpus-shaped
    Dataset ready for ``build_pipeline``.  Container format is sniffed
    per file by magic (zip ``PK``, else tar), not extension."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            base = os.path.basename(path)
            # a corrupt/non-archive file (stray README, truncated tar)
            # skips THAT file, never the batch or the job; a member
            # failing mid-walk keeps the members read so far
            try:
                members = (
                    _html_members_zip(data)
                    if data[:2] == b"PK"
                    else _html_members_tar(data)
                )
                for name, body in members:
                    rows.append(
                        _doc_row(f"{base}:{name}", body.decode("utf-8", "replace"))
                    )
            except (zipfile.BadZipFile, tarfile.TarError, OSError, EOFError):
                continue
        return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)

    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)
