"""Declarative ingest converters — flat files → the interleaved corpus.

GeoMesa's converter framework maps csv/tsv/json/avro/xml records onto
SimpleFeatures via a config of field expressions (public tree:
geomesa-convert/geomesa-convert-common/.../convert2/SimpleFeatureConverter
.scala + per-format modules; mount empty at survey time — SURVEY.md §0).

Spark restatement: a converter spec is a dict of target-column → Spark SQL
expression over the raw input; geometry fields use our ``st_*``/WKT
conventions; the output lands in the engine's document-spans shape or any
flat point table.  Everything is Catalyst expressions — the mapping
itself never leaves the JVM.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def convert(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Apply a {column: sql_expression} converter spec."""
    return df.select(*[F.expr(e).alias(c) for c, e in spec.items()])


def read_csv_points(
    spark: SparkSession, path: str, lon_col: str, lat_col: str, id_col: str,
    header: bool = True, schema: str | None = None, **options,
) -> DataFrame:
    """CSV → point table (the geomesa-convert-text analogue)."""
    reader = spark.read.options(header=header, **options)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    # TRY_CAST = the converter framework's `try`/`withDefault` semantics
    # (malformed input nulls, never aborts the ingest) — ANSI-mode safe
    return convert(
        df,
        {
            "doc_id": f"CAST({id_col} AS STRING)",
            "lon": f"TRY_CAST({lon_col} AS DOUBLE)",
            "lat": f"TRY_CAST({lat_col} AS DOUBLE)",
        },
    ).filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())


def read_json_points(
    spark: SparkSession, path: str, spec: dict[str, str], schema: str | None = None
) -> DataFrame:
    """JSON-lines → table via jsonPath-style expressions (get_json_object /
    dotted field access — the geomesa-convert-json analogue)."""
    df = spark.read.schema(schema).json(path) if schema else spark.read.json(path)
    return convert(df, spec)


def flat_points_to_spans(df: DataFrame, id_col: str = "doc_id", text_col: str | None = None) -> DataFrame:
    """Wrap a flat point table into the interleaved document-spans shape
    (one text span + one geo span), producing corpus-compatible rows."""
    text_expr = F.col(text_col) if text_col else F.concat(F.lit("doc "), F.col(id_col))
    geo_wkt = F.concat(
        F.lit("POINT("), F.col("lon").cast("string"), F.lit(" "), F.col("lat").cast("string"),
        F.lit(")"),
    )
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            text_expr.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("geo").alias("kind"),
            geo_wkt.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (F.length(text_expr) + 1).cast("int").alias("offset"),
        ),
    )
    return df.select(F.col(id_col).cast("string").alias("doc_id"), spans.alias("spans"))


def read_xml_points(
    spark: SparkSession, path: str, row_tag: str, spec: dict[str, str],
    schema: str | None = None, **options,
) -> DataFrame:
    """XML → table via Spark's native XML source (Spark 4) + a converter
    spec over the parsed fields (the geomesa-convert-xml analogue; its
    XPath expressions become dotted struct access in the spec)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema:
        reader = reader.schema(schema)
    return convert(reader.load(path), spec)


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width text → table: ``fields`` is a list of
    (name, start_1_based, length, spark_type).  Pure substring/TRY_CAST
    Catalyst expressions — the geomesa-convert fixed-width analogue;
    malformed values null out instead of aborting the ingest."""
    raw = spark.read.text(path)
    spec = {
        name: f"TRY_CAST(trim(substring(value, {start}, {length})) AS {typ})"
        for name, start, length, typ in fields
    }
    return convert(raw, spec)
