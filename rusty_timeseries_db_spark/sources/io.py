"""Batch source/sink surface beyond parquet (SURVEY §2.2 sources):
JSON / CSV scans with explicit schemas (the REPL/HTTP ingest formats,
R7/R9) and the batch append sink (R1).

Always explicit-schema: schema inference is a full extra pass over the
data — never acceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schema import TELEMETRY_INGEST_SCHEMA


def read_json(
    spark: SparkSession, path: str, schema: StructType = TELEMETRY_INGEST_SCHEMA
) -> DataFrame:
    """JSON-lines scan with explicit schema (HTTP POST body shape,
    main.rs:327-331). ``DROPMALFORMED``: the reference rejects malformed
    POST bodies (warp 400) rather than storing garbage — Spark's default
    PERMISSIVE mode would turn them into all-NULL rows."""
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = TELEMETRY_INGEST_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema (REPL insert token format analog,
    main.rs:252-284)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
    )


def append_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """R1 batch append sink: write new files, never rewrite
    (vs main.rs:81-90 whole-file rewrite per insert)."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (Spark-native columnar alternative; same append-only
    discipline as parquet). ORC carries its own stripe-level min/max
    indexes, so the layout guidance in operators/layout.py applies
    unchanged."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan. Schema optional: ORC is self-describing with typed
    footers (no inference pass over data, unlike JSON/CSV), but passing
    one pins the contract and enables column pruning before listing."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_parquet_evolving(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Schema-evolution read: union the schemas of every file footer
    (``mergeSchema``) so batches written before a column was added
    surface it as NULL instead of failing the scan. The reference's
    fixed 105-byte row codec (main.rs:152-188) cannot evolve at all —
    appended fields are an explicit capability extension.

    Passing ``schema`` instead PINS the contract (preferred once the
    evolved schema is known): no footer-merging pass over file
    metadata, and unexpected extra columns are dropped rather than
    silently widening downstream plans.
    """
    r = spark.read
    if schema is not None:
        return r.schema(schema).parquet(path)
    return r.option("mergeSchema", "true").parquet(path)
