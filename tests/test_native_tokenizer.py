"""Native C++ tokenizer: build, byte-identical parity with Python, throughput."""

import shutil
import time

import pytest

from openintel_tpu.ops.tokenizer import tokenize

gxx = shutil.which("g++")
pytestmark = pytest.mark.skipif(gxx is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from openintel_tpu import native as nat

    nat.build()
    assert nat.install()
    return nat


CASES = [
    "AAPL to the MOON!! buying calls",
    "0dte-YOLO_calls",
    "",
    "   ",
    "a",
    "UPPER lower 123 mixed42case",
    "$TSLA $$ @@@",
    "tabs\tand\nnewlines  spaced",
    "x" * 5000,
    "word " * 1000,
]


def test_native_matches_python_on_ascii(native):
    got = native.native_tokenize_batch(CASES)
    want = [tokenize(t) for t in CASES]
    assert got == want


def test_native_routes_non_ascii_to_python(native):
    texts = ["éclair café", "AAPL moon", "naïve œuvre 42"]
    got = native.native_tokenize_batch(texts)
    want = [tokenize(t) for t in texts]
    assert got == want


def test_native_is_wired_into_tokenize_batch(native):
    from openintel_tpu.ops import tokenizer as tok

    assert tok._native_tokenize_batch is not None
    assert tok.tokenize_batch(["Quick FOX"]) == [["quick", "fox"]]


def test_native_postings_builder_matches_python(native):
    import numpy as np
    from openintel_tpu.index.build import build_postings_index
    from openintel_tpu.index.synthetic import synthetic_token_corpus

    docs = synthetic_token_corpus(800, vocab_size=900, mean_len=30, seed=5)
    docs += ["", "   !!!  ", "repeat repeat repeat"]
    nat = build_postings_index(docs, use_native=True)
    py = build_postings_index(docs, use_native=False)
    assert nat.vocab.token_to_id == py.vocab.token_to_id
    np.testing.assert_array_equal(nat.term_offsets, py.term_offsets)
    np.testing.assert_array_equal(nat.doc_ids, py.doc_ids)
    np.testing.assert_array_equal(nat.tf, py.tf)
    np.testing.assert_array_equal(nat.doc_len, py.doc_len)
    np.testing.assert_array_equal(nat.df, py.df)
    np.testing.assert_allclose(nat.impact, py.impact, atol=0)
    assert nat.avgdl == py.avgdl


def test_native_postings_builder_throughput(native):
    from openintel_tpu.index.build import build_postings_index
    from openintel_tpu.index.synthetic import synthetic_token_corpus

    docs = synthetic_token_corpus(20_000, vocab_size=8000, mean_len=40, seed=6)
    t0 = time.time()
    build_postings_index(docs, use_native=False)
    t_py = time.time() - t0
    t0 = time.time()
    build_postings_index(docs, use_native=True)
    t_nat = time.time() - t0
    assert t_nat < t_py, f"native {t_nat:.3f}s not faster than python {t_py:.3f}s"
