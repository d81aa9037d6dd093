"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-native where possible (split/regexp run inside whole-stage
codegen); the language-ID n-gram scorer and the rolling-hash fingerprint
are Arrow-batched numpy.  Deterministic everywhere (no salted hashes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


def token_count(col) -> F.Column:
    """Whitespace token count — pure JVM expression."""
    return F.size(F.expr(f"filter(split({col}, '\\\\s+'), x -> length(x) > 0)"))


def bpe_ish_token_count(col) -> F.Column:
    """BPE-ish subword estimate: words + punctuation as separate tokens
    (regexp split on word boundaries) — pure JVM."""
    return F.size(
        F.expr(
            f"filter(split(lower({col}), '(?<=[^a-z0-9])|(?=[^a-z0-9])'), x -> trim(x) != '')"
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append integer-exact quality columns: n_chars, n_tokens, n_punct,
    n_digits, upper_ratio_pct, stopword_pct, mean_token_len_x10.
    All JVM-side; ratios scaled to integers for cross-engine exactness."""
    t = F.col(text_col)
    toks = f"filter(split({text_col}, '\\\\s+'), x -> length(x) > 0)"
    stops = f"size(filter(transform({toks}, x -> lower(x)), x -> x IN ('the','a','of','and','to')))"
    return (
        df.withColumn("n_chars", F.length(t).cast("bigint"))
        .withColumn("n_tokens", F.expr(f"size({toks})").cast("bigint"))
        .withColumn(
            "n_punct",
            (F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))).cast("bigint"),
        )
        .withColumn(
            "n_digits", (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("bigint")
        )
        .withColumn(
            "upper_pct",
            F.when(
                F.length(t) > 0,
                ((F.length(t) - F.length(F.regexp_replace(t, "[A-Z]", ""))) * 100 / F.length(t))
                .cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .withColumn(
            "stopword_pct",
            F.when(
                F.expr(f"size({toks})") > 0,
                (F.expr(stops) * 100 / F.expr(f"size({toks})")).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint")),
        )
    )


def quality_flag(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Boolean keep/drop flags in the Gopher-rule style, integer-exact."""
    q = quality_features(df, text_col)
    return q.withColumn(
        "keep",
        (F.col("n_tokens") >= 5)
        & (F.col("n_chars") >= 20)
        & (F.col("n_punct") * 3 <= F.col("n_chars"))
        & (F.col("n_digits") * 2 <= F.col("n_chars")),
    )


def lang_id_udf():
    """Arrow-batched language-ID heuristic: stopword-profile voting.
    Returns 'und' when nothing matches (deterministic tie-break by
    profile order)."""
    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
    order = list(profiles)

    @F.pandas_udf("string")
    def lang(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.to_numpy(object):
            if not t:
                out.append("und")
                continue
            toks = t.lower().split()
            if not toks:
                out.append("und")
                continue
            best, best_score = "und", 0
            for name in order:
                score = sum(1 for w in toks if w in profiles[name])
                if score > best_score:
                    best, best_score = name, score
            out.append(best)
        return pd.Series(out, dtype=object)

    return lang


def fingerprint_udf(window: int = 16):
    """64-bit document fingerprint: min of rolling polynomial hashes over
    byte windows (winnowing-style single fingerprint) — content-based,
    whitespace-robust enough for near-identical detection, deterministic."""
    from ..operators.dedup import _shingle_hashes

    @F.pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.to_numpy(object)):
            if not t:
                continue
            h = _shingle_hashes(" ".join(t.lower().split()), window)
            out[i] = np.int64(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF)) if len(h) else 0
        return pd.Series(out)

    return fp


def winnow_fingerprints(
    df: DataFrame,
    k: int = 16,
    w: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FULL winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): the distinct
    per-window minima of character k-gram hashes — the plagiarism-grade
    fingerprint SET, not just a global min (that is :func:`fingerprint_udf`,
    the numpy throughput tier; this is the all-JVM, oracle-portable tier,
    same two-tier pattern as MinHash/SimHash in ``operators/dedup``).

    Guarantee: any shared substring of length >= w + k - 1 between two
    documents yields at least one shared fingerprint.

    Engine shape: whitespace-normalize -> md5 each k-gram (first 16 hex
    chars; lexicographic min == numeric min on fixed-width hex) ->
    sliding-window array_min -> array_distinct -> explode.  Everything is
    one whole-stage-codegen project + explode: linear work, zero
    shuffles; grams never leave their row.

    Returns (id_col, fp) rows; docs shorter than k yield none.
    """
    norm = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    # NB: Spark's sequence(1, 0) yields the DESCENDING [1, 0], not an empty
    # array — docs shorter than k must be gated explicitly or they produce
    # spurious grams from out-of-range substrings.
    grams = (
        f"CASE WHEN length(_norm) < {k} THEN array() ELSE "
        f"transform(sequence(1, length(_norm) - {k} + 1), "
        f"i -> substring(md5(substring(_norm, i, {k})), 1, 16)) END"
    )
    fps = (
        f"CASE WHEN size(_grams) = 0 THEN array() ELSE "
        f"array_distinct(transform(sequence(1, greatest(size(_grams) - {w} + 1, 1)), "
        f"j -> array_min(slice(_grams, j, {w})))) END"
    )
    return (
        df.withColumn("_norm", F.expr(norm))
        .withColumn("_grams", F.expr(grams))
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (smooth idf,
    ``ln((N+1)/(df+1)) + 1`` — the sklearn convention).

    Float discipline for cross-engine exactness: idf is computed ONCE per
    distinct document frequency from integers and immediately quantized
    to micros; the ranking score is then the exact integer
    ``tf * idf_micros``, so rank order cannot depend on engine ulps.
    Ties break by term.

    100-TB shape: tokenize + per-doc term counts are one map-side-
    combinable shuffle on (doc, term); document frequencies aggregate the
    ALREADY-distinct (doc, term) pairs (no second distinct); the idf
    table is vocabulary-sized and broadcast back.  N comes from a
    metadata-scale count.

    Returns (id_col, rank, term, score_micros).
    """
    n_docs = df.count()
    toks = f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    tf = (
        df.select(id_col, F.explode(F.expr(toks)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "idf_micros",
            F.expr(f"CAST(ROUND((ln(({n_docs} + 1) / (df + 1.0)) + 1.0) * 1000000) AS BIGINT)"),
        )
        .drop("df")
    )
    scored = tf.join(F.broadcast(idf), "term").withColumn(
        "score_micros", F.expr("tf * idf_micros")
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("score_micros"), F.asc("term"))
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score_micros")
    )
