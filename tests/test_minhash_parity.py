"""minhash_signature's vectorized numpy kernel (optimization r8) must
be bit-identical to the all-JVM expression form it replaced — same
universal-hash integers, same empty/null semantics — because LSH
candidate recall (and therefore the survivor set) depends on the exact
signature values."""

from pyspark.sql import functions as F

from hudi_0_10_0_spark.functions.dedup import (
    MERSENNE_P,
    _perm_params,
    minhash_signature,
)
from hudi_0_10_0_spark.functions.text import word_shingles


def _jvm_reference_signature(df, text_col, k, shingle):
    # the original formulation: per-permutation array_min over JVM
    # expressions (kept here as the executable spec)
    sh = F.array_distinct(word_shingles(text_col, shingle))
    hashes = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)))
    mins = [
        F.array_min(
            F.transform(
                hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_P))
            )
        )
        for a, b in _perm_params(k)
    ]
    return df.withColumn("minhash", F.array(*mins))


def test_numpy_signature_matches_jvm_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "an entirely different document about spark query planning"),
        (4, "short text"),          # fewer words than the shingle width
        (5, ""),                     # empty → all-null signature
        (6, None),                   # null text → all-null signature
        (7, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    k = 16
    fast = {
        r["doc_id"]: r["minhash"]
        for r in minhash_signature(df, "text", k=k, shingle=3).collect()
    }
    ref = {
        r["doc_id"]: r["minhash"]
        for r in _jvm_reference_signature(df, "text", k, 3).collect()
    }
    assert fast == ref
    # identical inputs produce identical signatures; a null text has no
    # shingles → all-null signature (empty string yields one empty
    # shingle on BOTH paths, covered by the equality above)
    assert fast[1] == fast[2]
    assert fast[6] == [None] * k
