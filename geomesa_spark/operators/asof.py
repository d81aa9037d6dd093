"""As-of / interval joins.

The reference's TubeSelect has an as-of flavour (nearest-in-time match
along a track — public tree: geomesa-process-vector/.../tube/
TubeSelectProcess.scala; mount empty at survey time, SURVEY.md §0), and
Spark lacks a native as-of join.  Two implementations:

- :func:`asof_join` — the SCALABLE shape: tag both sides, union, one
  window over (by, ts) carrying the last right-side value forward.  One
  shuffle on the ``by`` key, no range explosion, no driver involvement;
  works at any size because it never materializes candidate pairs.
- :func:`asof_join_grouped` — ``cogroup.applyInPandas`` +
  ``pd.merge_asof`` per key for tolerance semantics (bounded lookback),
  Arrow-batched.

Tie semantics (pinned, tested): right rows sort BEFORE left rows at the
same timestamp, so a left row at t matches a right row at exactly t
(the ``<=`` as-of convention); among equal-ts right rows the largest id
wins (deterministic).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group.

    Returns the left rows + ``asof_<right_id>`` (+ requested value cols),
    null when no prior right row exists."""
    rv = right_value_cols or []
    l_tag = left.select(
        F.col(by), F.col(on), F.col(left_id).alias("_lid"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in rv],
        F.lit(1).alias("_side"),
    )
    r_tag = right.select(
        F.col(by), F.col(on),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_rv_{c}") for c in rv],
        F.lit(0).alias("_side"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows first at equal ts (side 0 < 1); among them larger id last
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_asof_rid", F.last("_rid", ignorenulls=True).over(w))
    for c in rv:
        filled = filled.withColumn(f"_asof_{c}", F.last(f"_rv_{c}", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).select(
        F.col(by),
        F.col(on),
        F.col("_lid").alias(left_id),
        F.col("_asof_rid").alias(f"asof_{right_id}"),
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in rv],
    )
    return out


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    tolerance_s: float | None = None,
) -> DataFrame:
    """merge_asof per group (Arrow-batched) with optional tolerance —
    for moderate per-key cardinalities; the window variant is the
    unbounded-scale default."""
    lcols = left.columns
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s else None

    def merge(key: tuple, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=lcols + ["asof_event_id"])
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(on, kind="mergesort")
        m = pd.merge_asof(
            l,
            r[[on, "event_id"]].rename(columns={"event_id": "asof_event_id"}),
            on=on,
            direction="backward",
            tolerance=tol,
        )
        return m[lcols + ["asof_event_id"]]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields)
    schema += ", asof_event_id " + right.schema["event_id"].dataType.simpleString()
    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(merge, schema=schema)
