"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (no Python
UDFs): tokenization is a regexp, language ID is stopword-list hit counting,
quality scoring is length/punct/stopword ratios, fingerprinting is a
normalized-text hash. Each operator is a ``DataFrame -> DataFrame`` over a
``text`` column and is designed to scan-parallelize at 100 TB (pure
row-local columnar work — no shuffle)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z0-9]+"

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately minimal + deterministic; at 100 TB this stays a broadcast-free
# literal IN-list evaluated in whole-stage codegen.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "que"],
}


def tokens(col: Column | str) -> Column:
    """Lower-cased word tokens (BPE-ish regexp split, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-gram (shingle) array via sequence+substring — JVM only."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles: join every n consecutive tokens."""
    toks = tokens(col)
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def stopword_hits(col: Column | str, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no list scores > 0. Deterministic tie-break:
    the lexicographically LARGEST language code wins (struct max over
    (hits, code)) — e.g. equal en/fr hits return 'fr'."""
    scored = []
    for code in sorted(LANG_STOPWORDS):  # de, en, es, fr — alphabetical
        scored.append(F.struct(stopword_hits(col, code).alias("hits"), F.lit(code).alias("code")))
    # greatest struct = max hits, tie → lexicographically LARGEST code;
    # keep that rule (documented) so SQL oracles can replicate it.
    best = F.greatest(*scored)
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features: n_chars, n_tokens, mean token
    length, punctuation count, stopword(en) ratio, and a composite
    ``quality_score`` in [0,1]. All built-in expressions."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    # explicit ASCII whitespace class, not \s: Java \s includes \x0B but
    # RE2 (DuckDB oracle) \s does not — spelling the class out keeps the
    # punct count identical across engines (code-review r5)
    punct = F.length(
        F.regexp_replace(F.col(text_col), "[A-Za-z0-9 \\t\\n\\x0B\\f\\r]", "")
    )
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mean_tok_len = F.when(n_tok > 0, (F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)))
                          .cast("double") / n_tok).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, sw_hits.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.3) * F.least(sw_ratio * 5, F.lit(1.0))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", sw_ratio)
        # fixed-point truncation, not ROUND: engines' ROUND(double, 6)
        # implementations disagree on 6th-decimal ties (Java HALF_UP on
        # the shortest repr vs float-multiply), while floor of the same
        # product is bit-stable across engines (code-review r5)
        .withColumn("quality_score", F.floor(score * F.lit(1e6)) / F.lit(1e6))
    )


# PII redaction (training-data pipelines scrub these before tokenizer
# training; the patterns stay in the Java-regex ∩ RE2 common subset so
# an external SQL engine can verify the scrub byte-for-byte)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}",
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone numbers with ``<KIND>`` placeholder
    tokens and count each kind. Counts are taken on the ORIGINAL text;
    redaction applies the patterns in ``PII_PATTERNS`` insertion order
    (deterministic — the placeholder of an earlier pattern contains no
    digits, so it can never create a later match). Pure JVM regexps in
    whole-stage codegen: scan-parallel at 100 TB, no shuffle."""
    c = F.col(text_col)
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long"),
        )
    scrubbed = c
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.withColumn("text_scrubbed", scrubbed)


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, public): the
    distinct-token fraction and the duplicated-bigram fraction, plus
    the standard >0.2 dup-bigram rejection flag. Entirely JVM array
    expressions over the tokenized text — per-row columnar work, no
    explode, no shuffle."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_tok - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(2))),
        )
    )
    n_big = F.size(bigrams)
    distinct_frac = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)).cast("double") / n_tok
    )
    dup_big_frac = F.when(n_big == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / n_big
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("distinct_token_frac", distinct_frac)
        .withColumn("dup_bigram_frac", dup_big_frac)
        .withColumn("flag_repetitive", dup_big_frac > F.lit(0.2))
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """64-bit document fingerprint = xxhash64 of the normalized text.
    Two docs share a fingerprint iff their canonical forms are equal
    (modulo 64-bit collisions)."""
    return F.xxhash64(normalize_text(col))


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap counterpart to the regexp
    tokenizer — both are asked of a training-data pipeline)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    )


def rolling_fingerprints(
    col: Column | str, k: int = 7, window: int = 4
) -> Column:
    """Winnowed rolling-hash fingerprints (the MOSS scheme): hash every
    k-gram of the normalized text, then keep the minimum hash of each
    ``window`` consecutive k-grams, deduplicated. Robust to local edits
    — two documents sharing a long passage share fingerprints even when
    the surrounding text differs, which plain whole-doc hashing misses.

    Entirely JVM-side: k-grams via sequence+substr, per-gram xxhash64,
    windowed min via slice+array_min — no UDF, scan-parallel, no
    shuffle."""
    norm = normalize_text(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))),
        lambda i: F.xxhash64(norm.substr(i, F.lit(k))),
    )
    n_windows = F.greatest(F.size(grams) - F.lit(window - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(grams, i, window)),
        )
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    pattern: str = "[a-z0-9]+",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary with frequencies — the classic word-count over
    a document table, the first step of tokenizer training / frequency
    filtering in a training-data pipeline.

    Shape at 100 TB: ``explode`` is scan-parallel; the ``groupBy(token)``
    benefits from map-side partial aggregation, so the shuffle carries
    one row per DISTINCT token per task, not one per occurrence. Skewed
    head tokens ("the") are exactly the case partial aggregation
    flattens."""
    c = F.col(text_col)
    src = F.lower(c) if lowercase else c
    # Column API, not an f-string into F.expr: interpolating the pattern
    # into SQL text broke on any pattern containing a quote (e.g.
    # "[a-z']+") and let a crafted pattern/column string inject arbitrary
    # SQL expressions (code-review r5)
    toks = df.select(
        F.explode(F.regexp_extract_all(src, F.lit(pattern), 0)).alias("token")
    )
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))


def word_ngrams(col: Column | str, n: int = 13) -> Column:
    """Word-level n-grams of the lowercased text as an array of
    space-joined strings — the unit of eval-set decontamination (the
    usual 13-gram rule). JVM-side: tokenize via regexp_extract_all,
    windows via sequence+slice+array_join; documents shorter than ``n``
    tokens yield an empty array."""
    toks = tokens(col)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Eval-set contamination: corpus documents sharing at least one
    word-level ``n``-gram with any eval document. Returns
    ``(doc_id, n_shared)`` with the count of DISTINCT shared n-grams.

    Scale shape: explode both sides to (gram, doc) pairs and equi-join
    on the gram — an inverted-index join, the same shape as
    ``ngram_jaccard_pairs``. The eval side is tiny relative to a 100 TB
    corpus, so Spark broadcasts its gram set; no all-pairs comparison
    anywhere."""
    c_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("g")
    ).dropDuplicates([id_col, "g"])
    e_grams = (
        eval_set.select(F.explode(word_ngrams(text_col, n)).alias("g"))
        .dropDuplicates(["g"])
    )
    return (
        c_grams.join(F.broadcast(e_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-budget chunks — the
    context-window preparation step between cleaning and sequence
    packing. Returns (id_col, chunk_index, chunk_text, n_tokens):
    chunk k starts at token 1 + k*stride (stride = chunk_tokens -
    overlap) and takes up to chunk_tokens tokens; starts run while
    start <= max(n_tokens - overlap, 1), so every token lands in a
    chunk, consecutive chunks share ``overlap`` tokens, and no chunk
    is a strict suffix of its predecessor. A document shorter than one
    chunk yields exactly one (possibly short) chunk.

    Entirely JVM-side (sequence/slice/posexplode in whole-stage
    codegen) — at 100 TB this is a row-local scan transformation with
    NO shuffle; output rows ≈ input tokens / stride."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        # a negative overlap would make the stride exceed the chunk size
        # and silently drop the tokens in between — reject both ends
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # materialize the token array once per row (multiple references keep
    # Catalyst from inlining the regexp into every consumer); n_tokens is
    # interval arithmetic on the chunk bounds — no second slice
    with_toks = df.withColumn("__toks", tokens(text_col))
    n = F.size(F.col("__toks"))
    upper = F.greatest(n - F.lit(overlap), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(1), upper, F.lit(stride)),
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(F.col("__toks"), s, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.greatest(
                F.least(s + F.lit(chunk_tokens - 1), n) - s + F.lit(1), F.lit(0)
            ).alias("n_tokens"),
        ),
    )
    exploded = with_toks.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_index", "__c")
    )
    return exploded.select(
        id_col, "chunk_index", F.col("__c.chunk_text"), F.col("__c.n_tokens")
    )
