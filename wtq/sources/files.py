"""File sources: CSV with declared schema, JSONL.

The reference ingests a SPARQL-exported CSV into a pre-declared DDL
(S4: ``\\copy raw_wikidata_waterways_ru from ... csv header`` after
explicit column DDL, bash/import_wikidata:14-16) — never schema
inference in production.  Same policy here: CSV/JSONL loads take an
explicit StructType; inference is opt-in for exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True, sep: str = ",") -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "FAILFAST")  # bad rows are a data bug, not noise
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Small-files compaction — the maintenance op every long-running
    ingest needs (each streaming micro-batch / checkpoint chunk writes
    its own files; a 100 TB table accumulates millions of them, and
    scan planning degrades with file count).  Rewrites `src` into
    ceil(rows / target_rows_per_file) files at `dst` via coalesce
    (no shuffle — existing partitions are merged, not redistributed).
    Returns the ACTUAL output file count — coalesce cannot increase
    partition count, so when the source already has fewer partitions
    than the target the smaller number is written and returned.  The
    row count costs one extra scan; a production version derives it
    from table metadata (Iceberg's rewrite_data_files does exactly
    that — this parquet form is the sandbox stand-in)."""
    df = spark.read.parquet(src)
    n = df.count()
    files = max(1, -(-n // target_rows_per_file))
    out = df.coalesce(files)
    actual = out.rdd.getNumPartitions()
    out.write.mode("overwrite").parquet(dst)
    return actual
