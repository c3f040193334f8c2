"""Text-analysis column functions for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` expression builders — JVM-side, whole-stage
codegen, no Python in the hot path. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars) but applicable to any string column.

These are beyond the reference's surface (it has no string functions at all —
SURVEY.md §2.3 "absent scalar-function surface"); they're first-class here
because a 100 TB Spark corpus pipeline needs them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A "BPE-ish" pre-tokenizer: letter runs, digit runs, single punctuation —
# the shape GPT-2-style byte-pair pre-splitting produces.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic so the DuckDB oracle can
# replicate the computation exactly.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
    "zh": ("de", "shi", "le", "bu", "wo", "you", "zai", "ta"),
}


def normalize(col: Column) -> Column:
    """Lowercase + whitespace-collapse + trim — canonical text form."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)).cast("bigint")


def ngrams(col: Column, n: int) -> Column:
    """n-token grams of the normalized text (array<string>); empty array
    for docs shorter than n tokens.

    arrays_zip over shifted copies (see operators/dedup.py shingles): a
    lambda must not capture the token array, or Spark re-evaluates the
    whole tokenization per gram — O(n²) per document."""
    toks = tokens(col)
    shifted = [toks] + [
        F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(0)))
        for i in range(1, n)
    ]
    full = F.filter(
        F.arrays_zip(*shifted), lambda s: s[str(n - 1)].isNotNull()
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(full, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


def type_token_ratio(col: Column) -> Column:
    """Distinct-token fraction (Gopher-style repetition signal): low values
    mean the document repeats itself."""
    toks = tokens(col)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    (The rolling-hash variant is ``minhash``'s shingle hash in
    operators/dedup.py; md5-of-normalized is the whole-document fingerprint.)
    """
    return F.md5(normalize(col))


def char_count(col: Column) -> Column:
    return F.length(col).cast("bigint")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation (0.0 when empty)."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def uppercase_ratio(col: Column) -> Column:
    n_upper = F.length(col) - F.length(F.regexp_replace(col, r"[A-Z]", ""))
    return F.when(F.length(col) > 0, n_upper / F.length(col)).otherwise(F.lit(0.0))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards moderate length,
    penalizes punctuation soup and ALL-CAPS. Deterministic arithmetic only
    (oracle-replicable)."""
    length_term = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    upper_term = F.lit(1.0) - F.least(uppercase_ratio(col) * 4.0, F.lit(1.0))
    return F.round((length_term + punct_term + upper_term) / 3.0, 6)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID signal)."""
    toks = tokens(col)

    def matcher(sw: tuple[str, ...]):
        return lambda t: t.isin(*sw)

    return {
        lang: F.size(F.filter(toks, matcher(sw))).cast("bigint")
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: Column) -> Column:
    """Pick the language with the most stopword hits; ties and zero-hit texts
    resolve to 'und' (undetermined) / lexicographically-first winner, fully
    deterministic."""
    scores = lang_scores(col)
    pairs = F.array(
        *[F.struct(score.alias("n"), F.lit(lang).alias("lang")) for lang, score in sorted(scores.items())]
    )
    # max by (n, then lexicographically-last lang loses): sort desc by n, asc by lang
    best = F.array_sort(
        pairs,
        lambda a, b: F.when(a["n"] > b["n"], -1)
        .when(a["n"] < b["n"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


# Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm):
# hash every character k-gram, then keep the minimum hash of each window of
# w consecutive k-gram hashes. Guarantees: any shared substring of length
# >= k + w - 1 contributes at least one shared fingerprint, and no match
# shorter than k is ever detected. Character-level, so it survives token
# reflows that break word-shingle dedup.
WINNOW_P = 2_147_483_647


def _md5_int(col: Column) -> Column:
    """First 15 hex digits of md5 as bigint — same engine-neutral hash as
    operators/dedup.py md5_int (kept in sync with the DuckDB oracle)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def winnow_fingerprints(col: Column, k: int = 7, w: int = 4) -> Column:
    """Sorted distinct winnowing fingerprints of the normalized text
    (array<bigint>).

    WARNING — short strings only: Spark evaluates a higher-order lambda's
    argument expressions per outer element, so the nested transform here
    recomputes the gram-hash array for EVERY window position — O(n²)
    interpreted md5 per row (~1s/doc at 1k grams). For corpus work use
    :func:`winnow_fingerprint_pairs`, which hashes each gram once."""
    s = normalize(col)
    n = F.length(s)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.substring(s, i, k),
    )
    hashes = F.transform(grams, lambda g: _md5_int(g) % WINNOW_P)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(hashes) - w + 1, F.lit(1))),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprint_pairs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    w: int = 4,
):
    """(id, fingerprint) pairs of the winnowing sketch — the SCALE path.

    The array-valued :func:`winnow_fingerprints` nests higher-order lambdas,
    and Spark evaluates a lambda's argument expressions per outer element —
    the gram-hash array is recomputed for every window position, O(n²)
    interpreted md5 per document. This variant computes each gram hash ONCE
    (posexplode, then hash per exploded row — plain codegen'd expressions)
    and takes window minima with a key-partitioned ROWS window, O(n·w) per
    document and one shuffle on the document id. Use this form for joins
    and aggregates; the array form is fine for short strings.
    """
    from pyspark.sql import Window

    # explode POSITIONS, not a gram array built by a lambda that captures
    # the normalized string (that form re-runs the normalize regex per
    # gram — O(n·|s|) per doc). The Generate's child computes __s once per
    # input row; the substring below runs once per exploded row.
    base = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__s"))
    ex = base.select(
        F.col(id_col),
        "__s",
        F.posexplode(
            F.sequence(
                F.lit(1), F.greatest(F.length("__s") - k + 1, F.lit(1))
            )
        ).alias("__pos", "__i"),
    )
    h = ex.select(
        F.col(id_col),
        F.col("__pos"),
        (
            _md5_int(F.substring(F.col("__s"), F.col("__i"), F.lit(k)))
            % WINNOW_P
        ).alias("__hv"),
    )
    fwd = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(0, w - 1)
    part = Window.partitionBy(id_col)
    return (
        h.withColumn("__wm", F.min("__hv").over(fwd))
        .withColumn("__n", F.count("*").over(part))
        # windows that extend past the last gram are not selection windows
        # (except when the doc has fewer than w grams: single window)
        .filter(
            (F.col("__pos") <= F.col("__n") - w) | (F.col("__pos") == 0)
        )
        .select(F.col(id_col), F.col("__wm").alias("fingerprint"))
        .distinct()
    )


def duplicated_spans(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 60,
    cross_doc_only: bool = False,
):
    """Exact duplicated-substring spans (the Lee et al. 2022 "Deduplicating
    Training Data" shape): every maximal character range of the normalized
    text whose ``min_len``-grams also occur elsewhere in the corpus.

    Suffix arrays don't distribute; the equivalent Spark-first pipeline is:
    hash EVERY ``min_len``-gram position (posexplode positions + substring —
    each gram hashed once, the winnow_fingerprint_pairs anti-recompute
    pattern), keep hashes occurring >= 2 times (``cross_doc_only`` demands
    two distinct documents, else within-doc repetition counts too), and
    merge the surviving fixed-length windows into maximal spans with a
    per-document lag window (linear per doc, keys spread across executors).
    Any duplicated substring of length >= min_len is covered by at least one
    surviving gram window, so the merged spans are exactly the maximal
    duplicated ranges at gram resolution. Hashes are 60-bit md5 prefixes —
    collision odds ~2^-60 per pair; exact-match verification of spans can be
    layered on for adversarial corpora.

    Returns (id_col, span_start, span_end): 1-based char offsets into the
    NORMALIZED text, end exclusive.
    """
    from pyspark.sql import Window

    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    base = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__s")).filter(
        F.length("__s") >= L
    )
    ex = base.select(
        F.col(id_col),
        "__s",
        F.explode(F.sequence(F.lit(1), F.length("__s") - L + 1)).alias("__pos"),
    )
    h = ex.select(
        F.col(id_col),
        F.col("__pos"),
        _md5_int(F.substring(F.col("__s"), F.col("__pos"), L)).alias("__h"),
    )
    agg = [F.count("*").alias("__n")]
    if cross_doc_only:
        agg.append(F.count_distinct(F.col(id_col)).alias("__nd"))
    freq = h.groupBy("__h").agg(*agg)
    dup = freq.filter(
        (F.col("__nd") >= 2) if cross_doc_only else (F.col("__n") >= 2)
    ).select("__h")
    pos_dup = h.join(dup, "__h").select(F.col(id_col), F.col("__pos"))
    w = Window.partitionBy(id_col).orderBy("__pos")
    grouped = (
        pos_dup.withColumn("__prev", F.lag("__pos").over(w))
        .withColumn(
            "__brk",
            F.when(
                F.col("__prev").isNull() | (F.col("__pos") > F.col("__prev") + L),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__gid",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return grouped.groupBy(id_col, "__gid").agg(
        F.min("__pos").cast("bigint").alias("span_start"),
        (F.max("__pos") + L).cast("bigint").alias("span_end"),
    ).select(id_col, "span_start", "span_end")
