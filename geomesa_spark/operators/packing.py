"""Corpus-assembly operators: the steps between a cleaned document table
and a training run — packing documents into fixed-token-budget sequences
and drawing balanced per-stratum samples.

Not part of the GeoMesa reference surface; these are LLM-pipeline
additions (same mandate as ``operators/dedup``).  Both are exact integer
pipelines so their DuckDB oracle twins match bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "source",
) -> DataFrame:
    """Assign every document to a fixed-token-budget PACK — the sequence-
    packing step of LLM training prep, in its concat-then-chunk form:
    documents are laid out in deterministic (group, id) order as one
    virtual token stream, and a document belongs to the pack its FIRST
    token lands in (``pack_id = floor(start_offset / budget)``).  Packs
    may overflow by at most one document's tail; exact greedy first-fit
    (reset leftover per pack) is inherently sequential state and is NOT
    what production packers do at corpus scale — they chunk the
    concatenated stream, exactly this.

    All integer math: token counts are whitespace-token counts (the
    engine's shared tokenizer surface), offsets come from an integer
    window cumsum, so the DuckDB twin is bit-exact.

    100-TB shape: one shuffle — the window partitions by ``group_col``
    (documents of one source stay contiguous, the usual curriculum
    requirement) and sorts by id within it.  A single giant source would
    serialize into one partition; shard such groups upstream (e.g.
    ``group = (source, doc_id div K)``) — the pack ids stay deterministic
    because the layout order is explicit, not arrival order.

    Returns (id_col, group_col?, n_tokens, start_offset, pack_id,
    offset_in_pack).
    """
    toks = f"size(filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != ''))"
    parts = [group_col] if group_col else []
    # explicit ROWS frame: Spark's default with orderBy is RANGE, which
    # gives tied (group, id) rows the sum over ALL their peers — both a
    # divergence from the oracle's ROWS frame and a silent under-fill on
    # duplicate ids
    base = Window.partitionBy(*parts) if parts else Window.partitionBy()
    w = base.orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = df.withColumn("n_tokens", F.expr(f"CAST({toks} AS BIGINT)"))
    d = d.withColumn(
        "start_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint"),
    )
    return d.select(
        id_col,
        *parts,
        "n_tokens",
        "start_offset",
        F.expr(f"CAST(start_offset DIV {budget} AS BIGINT)").alias("pack_id"),
        F.expr(f"CAST(start_offset % {budget} AS BIGINT)").alias("offset_in_pack"),
    )


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_cols: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum uniform sample, deterministic: rank rows
    within each stratum by the md5 of their id (a fixed random-but-
    reproducible order both engines compute identically — the same
    portable-hash idiom as the dedup md5 tiers) and keep rank <= k.
    The balanced-mixture primitive: equal document counts per (lang,
    source) regardless of raw skew.

    One shuffle (the per-stratum window); strata counts are the
    histogram a mixture config acts on.  Ties cannot occur (md5 of
    distinct ids collides only cryptographically; id breaks the tie
    anyway).

    Returns (*strata_cols, id_col, rank).
    """
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*strata_cols, id_col, "rank")
    )


def temperature_mixture_sample(
    df: DataFrame,
    k: int,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain mixing: resample the corpus so each
    source's share of the k-document training mix is proportional to
    n_source ** alpha instead of raw counts — the multilingual /
    multi-domain rebalancing rule (exponent-smoothed sampling in mBERT
    and XLM-R; alpha < 1 up-weights small domains, alpha = 1 keeps the
    natural mixture, alpha = 0 is uniform).  :func:`stratified_sample`
    is the alpha = 0 balanced special case with a per-stratum constant.

    Quota math is integer-exact cross-engine: each source's weight is
    sqrt(n) (alpha = 0.5, the default) quantized ONCE to micros —
    IEEE 754 requires sqrt correctly rounded, so both engines produce
    the identical BIGINT — and the quota is the integer division
    (k * w_micros) div sum(w_micros), under-allocating at most one doc
    per source (floor; documented, deterministic).  For alpha not in
    {0.5, 1.0} the weight uses pow(), which IEEE does not require
    correctly rounded — still deterministic per engine, but the oracle
    contract path pins alpha = 0.5.  Within a source, membership is the
    md5-rank order (same portable idiom as :func:`stratified_sample`).

    100-TB shape: one tiny count agg (map-side combined), quotas
    broadcast back, one per-source window for the rank.  A source so
    large its rank window skews one partition is handled the same way
    stratified_sample documents: pre-filter by an md5-prefix range to a
    superset before ranking.

    Returns (source_col, id_col, rank, quota) for the selected docs.
    """
    if alpha == 0.5:
        w_sql = "SQRT(CAST(n AS DOUBLE))"
    elif alpha == 1.0:
        w_sql = "CAST(n AS DOUBLE)"
    else:
        w_sql = f"POW(CAST(n AS DOUBLE), {float(alpha)})"
    weights = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w_micros", F.expr(f"CAST(ROUND({w_sql} * 1000000) AS BIGINT)"))
    )
    quotas = weights.withColumn(
        "quota",
        F.expr(f"CAST(({k} * w_micros) div SUM(w_micros) OVER () AS BIGINT)"),
    ).select(source_col, "quota")
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.select(source_col, id_col)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(quotas), source_col)
        .filter(F.col("rank") <= F.col("quota"))
        .select(source_col, id_col, "rank", "quota")
    )


def dsir_select(
    df: DataFrame,
    k: int,
    target_expr: str,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick the ``k`` raw documents whose hashed-unigram
    profile best matches a small target domain.  Both the target
    distribution p and the raw distribution q are bag-of-hashed-ngrams
    unigram models (the paper hashes uni+bigrams to 10k buckets; here
    whitespace unigrams to ``n_buckets``, the same tokenizer every other
    text op uses); a candidate's importance score is
    ``sum_b tf_b * (ln p_b - ln q_b)`` with Laplace +1 smoothing.  The
    paper perturbs scores with Gumbel noise to sample-without-replacement;
    this implementation takes the deterministic top-k (the noise-free
    limit), which keeps the op oracle-exact — documented deviation.

    ``target_expr`` is a SQL boolean over df's columns (e.g.
    ``"lang = 'en'"`` or ``"source = 'src0'"``).  Target rows define p and
    are EXCLUDED from the candidate pool (the paper's raw/target split;
    here the split is a predicate over one table).

    Float discipline (same convention as ccnet_perplexity_buckets /
    tfidf_topk): each bucket's log-ratio is computed ONCE from integer
    counts and quantized to micros; a doc's score is then the exact
    integer ``SUM(tf * ratio_micros)``, so ranking cannot depend on
    engine ulps.  Bucket ids come from the md5-prefix trick
    (``conv(substr(md5(tok),1,15),16,10) % n_buckets``) so Spark and
    DuckDB hash identically.

    100-TB shape: tokenize + per-(doc, bucket) tf is ONE map-side-
    combinable shuffle; p and q are per-bucket aggregates of those
    combined rows (<= n_buckets rows each — tiny); totals and the
    ratio table broadcast back; the final selection is
    ``orderBy(desc(score)).limit(k)`` = TakeOrderedAndProject, a
    distributed partial top-k with only k rows to the driver-side rank
    window.  No all-pairs stage, no unbounded collect.

    Returns (id_col, score_micros, rank), rank 1 = best match.
    """
    flagged = df.select(
        id_col, F.expr(target_expr).alias("_is_target"), text_col
    )
    toks = f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
    bucket = f"CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT) % {n_buckets}"
    tf = (
        flagged.select(id_col, "_is_target", F.explode(F.expr(toks)).alias("tok"))
        .select(id_col, "_is_target", F.expr(bucket).alias("bucket"))
        .groupBy(id_col, "_is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    p_cnt = (
        tf.filter("_is_target")
        .groupBy("bucket")
        .agg(F.sum("tf").alias("p_cnt"))
    )
    q_cnt = (
        tf.filter("NOT _is_target")
        .groupBy("bucket")
        .agg(F.sum("tf").alias("q_cnt"))
    )
    totals = p_cnt.agg(F.sum("p_cnt").alias("p_total")).crossJoin(
        q_cnt.agg(F.sum("q_cnt").alias("q_total"))
    )
    ratios = (
        q_cnt.join(p_cnt, "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "ratio_micros",
            F.expr(
                "CAST(ROUND(("
                f"ln(CAST(coalesce(p_cnt, 0) + 1 AS DOUBLE) / CAST(p_total + {n_buckets} AS DOUBLE))"
                f" - ln(CAST(coalesce(q_cnt, 0) + 1 AS DOUBLE) / CAST(q_total + {n_buckets} AS DOUBLE))"
                ") * 1000000) AS BIGINT)"
            ),
        )
        .select("bucket", "ratio_micros")
    )
    scored = (
        tf.filter("NOT _is_target")
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.expr("tf * ratio_micros")).alias("score_micros"))
    )
    topk = scored.orderBy(F.desc("score_micros"), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.desc("score_micros"), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        id_col, "score_micros", "rank"
    )
