"""BPE training/encoding: determinism, textbook-example parity,
lossless roundtrip, and distributed == driver-side encoding."""

import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.bpe import (
    _EOW,
    bpe_encode,
    bpe_train,
    decode_pieces,
    encode_word,
    learn_merges,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lower newer wider lowest newest widest",
    "low low low low low lower lower newest newest",
    "she sells sea shells on the sea shore",
]


@pytest.fixture(scope="module")
def corpus(ray_session):
    tbl = pa.table(
        {"doc_id": [f"d{i}" for i in range(len(TEXTS))], "text": TEXTS}
    )
    return ray.data.from_arrow(tbl).repartition(3)


def test_learn_merges_textbook_example():
    # the Sennrich et al. 2016 worked example vocabulary
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(vocab, 4)
    # highest-count pairs merge first: es(9) -> est(9) -> est</w>(9) -> lo(7)
    assert merges == [("e", "s"), ("es", "t"), ("est", _EOW), ("l", "o")]


def test_encode_word_applies_lowest_rank_first():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", _EOW): 2, ("l", "o"): 3}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + _EOW]
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + _EOW]
    assert encode_word("unseen", ranks) == ["u", "n", "s", "e", "e", "n", _EOW]


def test_train_is_deterministic_and_partitioning_invariant(corpus):
    a = bpe_train(corpus, n_merges=50)
    b = bpe_train(corpus.repartition(7), n_merges=50)
    assert a == b and len(a) == 50


def test_encode_roundtrips_and_matches_driver_side(corpus):
    merges = bpe_train(corpus, n_merges=30)
    out = bpe_encode(corpus, merges, keep_pieces=True).to_pandas()
    out = out.set_index("doc_id").sort_index()
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for i, text in enumerate(TEXTS):
        row = out.loc[f"d{i}"]
        # lossless: pieces concatenate back to the normalized text
        assert decode_pieces(list(row["pieces"])) == " ".join(text.lower().split())
        # distributed encode == the plain driver-side algorithm
        want = [p for w in text.lower().split() for p in encode_word(w, ranks)]
        assert list(row["pieces"]) == want
        assert row["n_pieces"] == len(want)
    # more merges => no more pieces (monotone compression)
    fewer = bpe_encode(corpus, merges[:5]).to_pandas()["n_pieces"].sum()
    assert out["n_pieces"].sum() <= fewer
