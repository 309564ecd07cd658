"""Schema-driven structured extraction (A9 analog).

Deterministic re-expression of the reference's third engine,
``StructuredContentEngine.fetchStructuredContent``
(/root/reference/src/StructuredContentEngine.ts:169-364): the caller
declares a typed output schema whose every field carries a description
(validated exactly like ``validateSchemaDescriptions``,
StructuredContentEngine.ts:117-158), the engine extracts one value per
field from each document's text/markdown, and returns a typed Arrow
table.  Where the reference prompts an LLM with the field descriptions,
this engine runs a deterministic per-field extractor (an RE2 regex with
one capture group) — the schema-validation → extract → typed-result
contract is identical, and an LLM-backed extractor could drop into
``StructuredExtractor`` as an actor-pool stage without changing the
pipeline shape.

Everything is vectorized: one ``pcompute.extract_regex`` + ``cast`` per
field per batch, no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pcompute

import ray.data


@dataclass(frozen=True)
class FieldSpec:
    """One output field: name, REQUIRED human description (the
    reference rejects schemas with description-less fields), an RE2
    regex whose first capture group is the value, the Arrow output
    type, and the fill value when the regex does not match."""

    name: str
    description: str
    # RE2 regex with exactly one NAMED capture group, e.g.
    # r"(?P<value>\d+)" (pyarrow.compute.extract_regex requires named
    # groups; the group name itself is arbitrary)
    pattern: str
    dtype: pa.DataType = pa.string()
    default: object = None


def validate_schema(fields: list[FieldSpec]) -> None:
    """Reject description-less fields, mirroring the reference's
    ``validateSchemaDescriptions`` error contract
    (/root/reference/src/StructuredContentEngine.ts:117-158)."""
    if not fields:
        raise ValueError("Schema must declare at least one field.")
    missing = [f.name for f in fields if not (f.description or "").strip()]
    if missing:
        raise ValueError(
            "All schema fields must have descriptions. "
            f"Missing descriptions for: {', '.join(missing)}"
        )
    names = [f.name for f in fields]
    if len(set(names)) != len(names):
        raise ValueError(f"Duplicate field names in schema: {names}")
    unnamed = [f.name for f in fields if "(?P<" not in f.pattern]
    if unnamed:
        raise ValueError(
            "Field patterns must contain one named capture group "
            f"(?P<value>...); missing for: {', '.join(unnamed)}"
        )


class StructuredExtractor:
    """``map_batches`` callable: text batches in → typed field table out.

    Stateless beyond the validated schema, so it runs as a task-pool
    stage by default; pass it as a callable CLASS with ``concurrency=``
    when a future extractor holds expensive state (an LLM client, a
    compiled grammar) — the contract stays the same.
    """

    def __init__(
        self, fields: list[FieldSpec], text_col: str = "text", id_col: str = "doc_id"
    ) -> None:
        validate_schema(fields)
        self.fields = fields
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        cols: dict = {self.id_col: batch[self.id_col]}
        for f in self.fields:
            # extract_regex yields a struct with one field per capture
            # group; a non-match yields null → filled with the default
            m = pcompute.extract_regex(text, pattern=f.pattern)
            val = pcompute.struct_field(m, 0)
            if not pa.types.is_string(f.dtype):
                val = pcompute.cast(val, f.dtype)
            if f.default is not None:
                val = pcompute.fill_null(val, pa.scalar(f.default, type=f.dtype))
            cols[f.name] = val
        return pa.table(cols)


def structured_extract(
    ds: "ray.data.Dataset",
    fields: list[FieldSpec],
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: Optional[int] = 4096,
    concurrency: Optional[int] = None,
    extractor_cls: type = StructuredExtractor,
) -> "ray.data.Dataset":
    """Run schema-driven extraction over a document Dataset; returns a
    Dataset of (id, <field>...) with the declared Arrow types.

    ``concurrency=None`` (default) runs the extractor as a task-pool
    stage.  Passing ``concurrency=N`` switches to the ACTOR-POOL form —
    ``extractor_cls`` is constructed once per actor (this is the slot an
    LLM-backed extractor with an expensive client/model in ``__init__``
    drops into, mirroring the reference's provider surface,
    StructuredContentEngine.ts:366-384) and the output contract is
    identical; ``tests/test_structured.py`` pins task-pool == actor-pool
    equality."""
    if concurrency is None:
        ex = extractor_cls(fields, text_col=text_col, id_col=id_col)
        return ds.map_batches(ex, batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(
        extractor_cls,
        fn_constructor_kwargs={"fields": fields, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
