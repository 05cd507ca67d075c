"""Structured Streaming tests: AvailableNow drain equals batch results;
custom stateful operator (applyInPandasWithState) equals batch agg."""

from __future__ import annotations

from pyspark.sql import functions as F

from wtq.streaming.ingest import running_user_totals, windowed_event_counts

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_equal_batch(spark, tmp_path):
    got = windowed_event_counts(spark, SF_DIR, str(tmp_path / "ck1")).toPandas()
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis("w.start").alias("window_ms"), "event_type", "n")
        .toPandas()
    )
    g = got[["window_ms", "event_type", "n"]].sort_values(["window_ms", "event_type"]).reset_index(drop=True)
    b = batch.sort_values(["window_ms", "event_type"]).reset_index(drop=True)
    assert g.equals(b)


def test_stateful_running_totals(spark, tmp_path):
    got = running_user_totals(spark, SF_DIR, str(tmp_path / "ck2")).toPandas()
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .toPandas()
    )
    m = got.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(m) == len(batch) == len(got)
    assert (m.n_s == m.n_b).all()
    assert (abs(m.total_s - m.total_b) < 1e-9).all()


def test_streaming_pipeline_matches_batch(spark, pages_path, tmp_path):
    """The incremental (Structured Streaming) pipeline must produce
    decision-for-decision the same output as the batch pipeline on the
    same snapshot — the same-logic-both-modes contract."""
    from wtq.pipeline import run_pipeline
    from wtq.streaming.ingest import streaming_pipeline

    out = str(tmp_path / "stream_out")
    streaming_pipeline(spark, pages_path, str(tmp_path / "ckpt"), out)
    streamed = (
        spark.read.parquet(out)
        .select("url", "keep", "fired_rules")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    batch = (
        run_pipeline(spark, pages_path, num_partitions=8)
        .decisions.toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch)
    assert (streamed.url == batch.url).all()
    assert (streamed.keep == batch.keep).all()
    assert all(list(a) == list(b) for a, b in zip(streamed.fired_rules, batch.fired_rules))


def test_streaming_pipeline_is_incremental(spark, pages_path, tmp_path):
    """New files landing in the input directory are processed by the
    next run WITHOUT reprocessing the old ones — the checkpoint carries
    the file-source state forward (the incremental property itself,
    not just batch parity)."""
    import shutil

    import pandas as pd

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    shutil.copy(pages_path, src_dir / "batch1.parquet")

    from wtq.streaming.ingest import streaming_pipeline

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    streaming_pipeline(spark, str(src_dir), ckpt, out)
    n1 = spark.read.parquet(out).count()

    extra = pd.read_parquet(pages_path).head(7).copy()
    extra["url"] = extra["url"] + "-late"
    extra.to_parquet(src_dir / "batch2.parquet", index=False)

    streaming_pipeline(spark, str(src_dir), ckpt, out)
    total = spark.read.parquet(out)
    assert total.count() == n1 + 7  # batch1 NOT reprocessed
    assert total.filter(total.url.endswith("-late")).count() == 7


def test_streaming_classifier_scores_match_batch(spark, tmp_path):
    """Model-based quality scoring on an incremental crawl: nb_score is
    a stateless stream-static broadcast pass, so the same call works
    unchanged on a readStream source and must score doc-for-doc
    identically to batch (exact BIGINT scores — equality, no
    tolerance)."""
    from wtq.operators.classifier import nb_score, train_nb_weights

    seed = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog", True),
            ("a clear morning with coffee and a good book", True),
            ("zxq vrb plk qqj xxw zzv mmk rrt yyp wwl", False),
            ("jjx kkq vvz ppw qqr llt zzy xxo mml rrw", False),
        ],
        "text string, y boolean",
    )
    w, c = train_nb_weights(seed)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    )
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        nb_score(stream, w, c)
        .writeStream.format("memory")
        .queryName("nb_stream_scores")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from nb_stream_scores").toPandas()
    exp = nb_score(spark.read.parquet(src), w, c).toPandas()
    key = ["doc_id", "n_toks", "score_micro", "keep_pred"]
    g = got[key].sort_values("doc_id").reset_index(drop=True)
    e = exp[key].sort_values("doc_id").reset_index(drop=True)
    assert g.equals(e) and len(g) == docs.count()
