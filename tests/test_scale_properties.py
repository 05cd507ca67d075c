"""Scale-discipline and property-based tests.

Skew: the generator plants a Zipf host distribution (host0 owns ~22%
of urls). Salted murmur3(url) repartitioning must spread work evenly
anyway (SURVEY.md §7 hard-part 3).

Properties (hypothesis): scrub idempotence and determinism over
adversarial strings — no Spark needed, these gate the pure cores.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wtq.pipeline import metrics_view, run_pipeline
from wtq.rules.heuristics import py_stats
from wtq.rules.langid import predict_lang
from wtq.rules.perplexity import char_perplexity
from wtq.rules.scrub import scrub_text


def test_host_skew_broken_by_salted_repartition(spark, pages_path, pages_pdf):
    hosts = pages_pdf.url.str.extract(r"https://([^/]+)/")[0]
    top_share = hosts.value_counts(normalize=True).iloc[0]
    assert top_share > 0.15  # the skew is really planted

    res = run_pipeline(spark, pages_path, num_partitions=8)
    m = metrics_view(res.decided).toPandas()
    assert len(m) == 8
    assert m.n_input.max() / m.n_input.mean() < 1.5  # balanced anyway


TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scrub_idempotent_property(t):
    once = scrub_text(t)
    twice = scrub_text(once.text)
    assert once.text.encode("utf-8") == twice.text.encode("utf-8")
    assert twice.n_email == twice.n_phone == twice.n_ip == 0


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scorers_total_and_deterministic(t):
    a = (predict_lang(t), char_perplexity(t), py_stats(t))
    b = (predict_lang(t), char_perplexity(t), py_stats(t))
    assert a == b
    lang, margin = a[0]
    assert margin >= 0.0 and a[1] >= 0.0


def test_approx_count_distinct_tolerance(spark):
    """Approx aggs exist but are not oracle-matchable across engines
    (different sketches) — assert Spark's HLL is within 5% of exact."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_salted_join_equals_plain_join(spark):
    from wtq.operators.skew import salted_join

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").orderBy("o_orderkey").collect()
    salted = salted_join(o, c, "o_custkey", salt=4).orderBy("o_orderkey").collect()
    assert plain == salted


def test_bucketed_join_avoids_exchange(spark, tmp_path):
    """Co-located join via bucketing: both sides bucketed by the join
    key → SortMergeJoin with NO Exchange (the 100 TB co-location
    strategy replacing the reference's btree join indexes,
    SURVEY.md §4)."""
    from wtq.plans.audit import plan_string

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # (warehouse dir is a static conf — uses ./spark-warehouse, gitignored;
    # stale dirs survive a fresh metastore, so remove them explicitly)
    import shutil

    for name, df, key in (("b_orders", o, "o_orderkey"), ("b_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)
    # at test scale the small side would be broadcast; disable to expose
    # the bucketed sort-merge join that a 100 TB fact⋈fact would use
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderstatus").count()
        plan = plan_string(j, mode="simple")
        assert "SortMergeJoin" in plan
        # the join itself needs no shuffle; only the final agg exchanges
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
