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
