"""Schema-driven structured extraction (A9 analog): validation contract
mirrors reference StructuredContentEngine.ts:117-158, extraction yields
typed columns with defaults on non-match."""

import pyarrow as pa
import pytest


def test_validate_schema_rejects_missing_descriptions():
    from fetch_engines_ray.stages.structured import FieldSpec, validate_schema

    with pytest.raises(ValueError, match="descriptions.*price"):
        validate_schema(
            [
                FieldSpec(name="title", description="doc title", pattern=r"(?P<v>.+)"),
                FieldSpec(name="price", description="", pattern=r"(?P<v>\d+)"),
            ]
        )
    with pytest.raises(ValueError, match="named capture group"):
        validate_schema(
            [FieldSpec(name="t", description="d", pattern=r"(\d+)")]
        )
    with pytest.raises(ValueError, match="at least one field"):
        validate_schema([])


def test_structured_extract_typed_fields(ray_session):
    import ray.data

    from fetch_engines_ray.stages.structured import FieldSpec, structured_extract

    ds = ray.data.from_items(
        [
            {"doc_id": "a", "text": "Price: 42 dollars for the widget"},
            {"doc_id": "b", "text": "no numerals in here at all"},
        ]
    )
    fields = [
        FieldSpec(
            name="price",
            description="first integer",
            pattern=r"(?P<v>\d+)",
            dtype=pa.int64(),
            default=-1,
        ),
        FieldSpec(
            name="after_the",
            description="word after 'the'",
            pattern=r"\bthe\s+(?P<v>\w+)",
            default="",
        ),
    ]
    rows = {r["doc_id"]: r for r in structured_extract(ds, fields).take_all()}
    assert rows["a"]["price"] == 42 and rows["a"]["after_the"] == "widget"
    assert rows["b"]["price"] == -1 and rows["b"]["after_the"] == ""


def test_structured_extract_actor_pool_drop_in(ray_session):
    """The actor-pool form is a drop-in for the task-pool form: same
    typed output, expensive __init__ paid once per ACTOR (not per
    batch), concurrency bounded by the pool size.

    The extractor class is defined INSIDE the test so cloudpickle
    serializes it by value — a test-module top-level class is pickled
    by reference and Ray workers cannot import `test_structured`
    (actors crash-loop as perpetually pending).
    """
    import pandas as pd

    import ray.data

    from fetch_engines_ray.stages.structured import FieldSpec, structured_extract

    class ExpensiveStateExtractor:
        """Actor extractor with deliberately expensive __init__ state —
        the LLM-client simulation for the drop-in slot."""

        def __init__(self, fields, text_col="text", id_col="doc_id"):
            import os
            import time

            from fetch_engines_ray.stages.structured import StructuredExtractor

            time.sleep(0.25)  # simulated model/client load
            self._inner = StructuredExtractor(fields, text_col=text_col, id_col=id_col)
            self._ident = f"{os.getpid()}-{id(self)}"
            self.n_batches = 0

        def __call__(self, batch):
            import pyarrow as _pa

            self.n_batches += 1
            out = self._inner(batch)
            return out.append_column(
                "actor_id", _pa.array([self._ident] * out.num_rows)
            )

    rows = [
        {"doc_id": f"d{i:03d}", "text": f"item {i} of the batch costs {i * 3} coins"}
        for i in range(200)
    ]
    ds = ray.data.from_items(rows)
    fields = [
        FieldSpec(
            name="first_number",
            description="first integer",
            pattern=r"(?P<v>\d+)",
            dtype=pa.int64(),
            default=-1,
        ),
        FieldSpec(
            name="after_the",
            description="word after 'the'",
            pattern=r"\bthe\s+(?P<v>\w+)",
            default="",
        ),
    ]
    task_out = (
        structured_extract(ds, fields).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    actor_out = (
        structured_extract(
            ds,
            fields,
            batch_size=16,
            concurrency=2,
            extractor_cls=ExpensiveStateExtractor,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_actors = actor_out["actor_id"].nunique()
    n_batches = -(-len(rows) // 16)
    assert 1 <= n_actors <= 2 < n_batches  # init once per actor, not per batch
    pd.testing.assert_frame_equal(task_out, actor_out.drop(columns=["actor_id"]))
