"""Bit-parity pin for the vectorized SimHash path (optimization r9).

``hash_token`` is the executable scalar SPEC; ``fnv1a_vec`` is the
vectorized implementation the UDF actually runs. Any drift between them
silently changes every simhash signature, so both the hash and the full
per-doc signature are pinned against a reference re-implementation of
the pre-r9 scalar UDF body.
"""

import re

import numpy as np
import pytest

from hudi_0_10_0_spark.functions.dedup import fnv1a_vec, hash_token

TOKENS = [
    "hello",
    "a",
    "",
    "the",
    "naïve",            # multi-byte UTF-8
    "日本語トークン",      # 3-byte sequences
    "🎉emoji🎉",         # 4-byte sequences
    "x" * 300,           # longer than any other (ragged padding)
    "MiXeD",
    "123",
    "\ttab",
]


def test_fnv1a_vec_matches_scalar_spec():
    got = fnv1a_vec(np.array(TOKENS, dtype=object))
    want = np.array([hash_token(t) for t in TOKENS], dtype=np.uint64)
    assert got.dtype == np.uint64
    assert (got == want).all(), list(zip(TOKENS, got, want))


def test_fnv1a_vec_empty_input():
    assert fnv1a_vec(np.array([], dtype=object)).shape == (0,)


def _scalar_simhash(text, k_bits=64):
    """The pre-r9 UDF body, verbatim (per-doc scalar hashing)."""
    tok_re = re.compile(r"[^ \t\n\f\r]+")
    if not text:
        return 0
    toks = np.array(
        [hash_token(w) for w in tok_re.findall(str(text).lower())],
        dtype=np.uint64,
    )
    if toks.size == 0:
        return 0
    bits = ((toks[:, None] >> np.arange(k_bits, dtype=np.uint64)) & 1).astype(np.int64)
    v = np.where(bits.sum(axis=0) * 2 >= toks.size, 1, 0).astype(np.uint64)
    return int((v << np.arange(k_bits, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64))


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "",
    None,
    "one-token",
    "repeated repeated repeated repeated words words",
    "Tab\tseparated\tand  double  spaced",
    "unicode: naïve café 日本語 🎉 — dash",
    "   ",
]


def test_simhash_udf_matches_scalar_spec(spark):
    import pandas as pd

    from hudi_0_10_0_spark.functions.dedup import simhash_udf

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", simhash_udf()("text").alias("sh")).collect()
    }
    for i, d in enumerate(DOCS):
        assert got[i] == _scalar_simhash(d), (i, d)
