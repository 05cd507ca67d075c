"""Table IO abstraction: Iceberg at cluster scale, parquet here.

The production deployment (north rule) reads/writes Iceberg tables:
snapshot isolation gives the resume semantics wtq/checkpoint.py needs,
``bucket(url, N)`` partition transforms turn the chunk predicate into
partition pruning, and storage-partitioned joins remove the re-crawl
dedup exchange entirely.  The Iceberg runtime jar cannot be downloaded
in this sandbox, so `table_format()` probes for it and the code path
falls back to plain parquet with identical call sites — swap the
format string, nothing else changes.

Reference mapping: every CTAS stage (S5, proccess_data.sql:11-12 etc.)
becomes `write_table`; the `\\copy` CSV ingest (S4,
bash/import_wikidata:14-16) is wtq/sources/files.py.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession


@lru_cache(maxsize=1)
def iceberg_available(spark_version: str = "") -> bool:
    try:
        import importlib.util  # noqa: F401
        from pyspark.sql import SparkSession as S

        s = S.getActiveSession()
        if s is None:
            return False
        s._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def table_format(spark: SparkSession) -> str:
    return "iceberg" if iceberg_available(spark.version) else "parquet"


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.format(table_format(df.sparkSession)).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(table_format(spark)).load(path)
