"""build_training_set: the one-entry-point curation stack.

Contracts pinned here: stage conservation (monotone non-increasing
counts, every count correct), the split partitions the survivors
exactly with no overlap, benchmark-slice docs never leak into any
split, and the whole build is deterministic (rerun → byte-identical
membership)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wtq.build import BENCH_SLICE_MOD, _hash_bucket, build_training_set


def test_build_training_set_end_to_end(spark, pages_path, tmp_path):
    out = str(tmp_path / "corpus")
    res = build_training_set(spark, pages_path, out, num_partitions=8)

    lineage = {r.stage: r.n_docs for r in res.lineage.collect()}
    stages = sorted(lineage)
    # monotone: every stage only removes documents
    for a, b in zip(stages, stages[1:]):
        if b == "50_written":
            continue
        assert lineage[a] >= lineage[b], (a, b, lineage)
    assert lineage["10_quality_kept"] > 0
    # written = post-budget survivors, exactly
    assert lineage["50_written"] == lineage["40_after_budget"] > 0

    written = spark.read.parquet(out)
    assert set(written.columns) == {"url", "text", "n_tokens", "split"}
    # the three splits partition the output (no url in two splits)
    assert written.select("url").distinct().count() == written.count()
    splits = {r.split for r in written.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # benchmark-slice urls never leak into any split
    leaked = written.filter(_hash_bucket("url", BENCH_SLICE_MOD) == 0).count()
    assert leaked == 0

    # determinism: a second build yields byte-identical membership
    out2 = str(tmp_path / "corpus2")
    build_training_set(spark, pages_path, out2, num_partitions=8)
    a = {(r.url, r.split) for r in spark.read.parquet(out).select("url", "split").collect()}
    b = {(r.url, r.split) for r in spark.read.parquet(out2).select("url", "split").collect()}
    assert a == b


def test_build_with_explicit_benchmark(spark, pages_path, tmp_path):
    """Production shape: a real benchmark gram table decontaminates the
    corpus; docs sharing a 13-gram with it are dropped."""
    from wtq.operators.curation import benchmark_grams

    pages = spark.read.parquet(pages_path)
    # use a real page's text as the 'benchmark task' — its 13-grams
    # must knock out that page (and any near-verbatim re-use of it)
    donor = pages.orderBy("url").limit(1)
    bench = benchmark_grams(donor, "text")
    out = str(tmp_path / "corpus")
    res = build_training_set(
        spark, pages_path, out, num_partitions=8, benchmark=bench
    )
    donor_url = donor.collect()[0]["url"]
    written = spark.read.parquet(out)
    hit = written.filter(F.col("url") == donor_url).count()
    # the donor is either quality/dedup-dropped upstream or
    # decontaminated — it must never be in the final corpus (its text
    # IS benchmark material), provided it was long enough to gram
    n_words = len([w for w in donor.collect()[0]["text"].split(" ") if w])
    if n_words >= 13:
        assert hit == 0
    assert res.lineage.filter("stage = '50_written'").collect()[0].n_docs > 0
