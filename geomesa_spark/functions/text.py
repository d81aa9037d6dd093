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
