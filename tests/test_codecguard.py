"""Failure-containment contract of ops/codecguard.guarded."""
import pytest

from fetch_engines_ray.ops.codecguard import guarded


class FakeFormatError(Exception):
    pass


def test_guarded_normalizes_walk_errors():
    @guarded(FakeFormatError)
    def decode(b):
        raise IndexError("truncated stream")

    with pytest.raises(FakeFormatError, match="IndexError"):
        decode(b"")


def test_guarded_passes_contract_error_through():
    @guarded(FakeFormatError)
    def decode(b):
        raise FakeFormatError("bad magic")

    with pytest.raises(FakeFormatError, match="bad magic"):
        decode(b"")


def test_guarded_reraises_resource_exhaustion():
    """MemoryError / RecursionError from an oversized-but-VALID payload
    is resource exhaustion, not data corruption — reclassifying it as a
    *FormatError would make fingerprinters silently skip the row as
    'corrupt' (advice finding)."""

    @guarded(FakeFormatError)
    def decode_mem(b):
        raise MemoryError("payload too large")

    @guarded(FakeFormatError)
    def decode_rec(b):
        raise RecursionError("nested beyond limit")

    with pytest.raises(MemoryError):
        decode_mem(b"")
    with pytest.raises(RecursionError):
        decode_rec(b"")
