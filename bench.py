#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipeline + representative operator queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "pipeline_docs_per_sec", "value": N, "unit": "docs/sec",
     "queries": {...per-query seconds...}, "sf": ..., "cpus": ...,
     "n_docs": ...}

The pipeline metric is end-to-end: read pages parquet → re-crawl dedup
→ salted repartition → Arrow scrub/score → rule battery → write
decisions + scrubbed + metrics to parquet sinks (real I/O included).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("WTQ_BENCH_REPLICATE", "8"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wtq.generate import ensure_pages
    from wtq.pipeline import run_pipeline
    from wtq.queries import QUERIES
    from wtq.session import get_spark

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    pages_path = ensure_pages(sf_dir, replicate=replicate)

    spark = get_spark("wtq-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    n_pages = spark.read.parquet(pages_path).count()
    log(f"bench: sf_dir={sf_dir} cpus={cpus} pages={n_pages}")

    # -- warmup: JIT/codegen + Python worker pool spin-up (not timed) --
    # (must aggregate a UDF-derived column: count(*) would let Catalyst
    # prune the Python scoring pass and warm nothing)
    run_pipeline(spark, pages_path, num_partitions=cpus).decided.agg(
        F.sum(F.size("fired_rules"))
    ).collect()

    # -- headline: full pipeline with real sinks --
    # Materialize the decided stage ONCE (the reference's CTAS-at-fan-out
    # pattern, SURVEY.md §3/E1), then derive the three output views from
    # the materialized parquet — cheaper than recomputing or caching.
    from wtq.pipeline import decisions_view, metrics_view, scrubbed_view

    out = tempfile.mkdtemp(prefix="wtq_bench_")

    def one_pipeline_run() -> tuple[float, int]:
        t0 = time.time()
        # exactly one partition per core: the Arrow score pass is the
        # heavy narrow stage and over-splitting it 4x was measured 37%
        # slower at this batch size (per-task Arrow + scheduling
        # overhead; same economics as minhash_signatures' repartition
        # note).  At cluster scale the partition count follows data
        # size, not this constant.
        res = run_pipeline(spark, pages_path, num_partitions=cpus)
        res.decided.write.mode("overwrite").parquet(f"{out}/decided")
        t1 = time.time()
        log(f"  decided write: {t1 - t0:.2f}s")
        decided = spark.read.parquet(f"{out}/decided")
        n = decided.count()
        decisions_view(decided).write.mode("overwrite").parquet(f"{out}/decisions")
        scrubbed_view(decided).write.mode("overwrite").parquet(f"{out}/scrubbed")
        metrics_view(decided).write.mode("overwrite").parquet(f"{out}/metrics")
        log(f"  derived views: {time.time() - t1:.2f}s")
        return time.time() - t0, n

    # best-of-3: the VM throttles under sustained load (the same warm
    # job has measured 5s and 75s minutes apart)
    pipeline_samples: list[float] = []
    pipeline_sec, n_docs = one_pipeline_run()
    pipeline_samples.append(pipeline_sec)
    for _ in range(2):
        sec_i, _ = one_pipeline_run()
        pipeline_samples.append(sec_i)
        pipeline_sec = min(pipeline_sec, sec_i)
    shutil.rmtree(out, ignore_errors=True)
    docs_per_sec = n_docs / pipeline_sec
    log(f"pipeline: {n_docs} docs in {pipeline_sec:.2f}s = {docs_per_sec:.0f} docs/sec")

    # -- representative operator queries --
    headline = [
        "pricing_summary",
        "region_revenue",
        "latest_event_per_user",
        "event_pivot",
        "dedup_exact",
        "dedup_minhash_lsh",
        "simhash",
        "simhash_near_pairs",
        "dedup_clusters",
        "ann_bruteforce",
        "doc_decisions",
        "top_words",
        "spatial_radius_join",
        "tfidf_top_terms",
        "media_features",
        "ann_ivf_topk",
        "order_value_deciles",
        # curation family (driver-registered since round 4)
        "decontaminate",
        "incremental_corpus_dedup",
        "token_budget_sample",
        "source_quality_gate",
        "strip_boilerplate",
    ]
    q_times: dict[str, float] = {"pipeline": round(pipeline_sec, 3)}
    q_samples: dict[str, list[float]] = {
        "pipeline": [round(s, 3) for s in pipeline_samples]
    }
    from wtq.queries import EXTRA_QUERIES

    QUERIES = {**QUERIES, **EXTRA_QUERIES}
    for name in headline:
        # best-of-3: the VM throttles under sustained load — the same
        # warm query has measured 2.3s and 9.7s minutes apart, so two
        # samples are not enough to reliably catch a clean one
        samples = []
        for _ in range(3):
            t0 = time.time()
            # full collect (results are small) so no column gets pruned away
            n = len(QUERIES[name](spark, sf_dir).collect())
            samples.append(time.time() - t0)
        q_times[name] = round(min(samples), 3)
        q_samples[name] = [round(s, 3) for s in samples]
        log(f"{name}: {q_times[name]}s ({n} rows) samples={q_samples[name]}")

    # Integrated curation run (strip_boilerplate + host_gate flags):
    # the one-entry-point chain a real curation build uses — timed
    # like a query (best-of-3, decisions sink) but reported under its
    # own key, separate from the flagless headline.
    cur_out = tempfile.mkdtemp(prefix="wtq_bench_cur_")
    samples = []
    for _ in range(3):
        t0 = time.time()
        res = run_pipeline(
            spark, pages_path, num_partitions=cpus,
            strip_boilerplate=True, host_gate=True,
        )
        res.decided.write.mode("overwrite").parquet(f"{cur_out}/decided")
        samples.append(time.time() - t0)
    shutil.rmtree(cur_out, ignore_errors=True)
    q_times["pipeline_curated"] = round(min(samples), 3)
    q_samples["pipeline_curated"] = [round(s, 3) for s in samples]
    log(f"pipeline_curated: {q_times['pipeline_curated']}s samples={q_samples['pipeline_curated']}")

    # Second headline sampling window: the host's effective speed
    # swings up to ~3x on a minutes scale (DEVNOTES), and all three
    # initial pipeline samples come from the same ~1-minute window at
    # the start of the bench.  Re-sampling the IDENTICAL job after the
    # query sweep gives the headline a second, ~6-minutes-later window;
    # best across both is reported (the same best-of-N rationale,
    # applied across time).
    out = tempfile.mkdtemp(prefix="wtq_bench_")
    for _ in range(2):
        sec_i, _n = one_pipeline_run()
        pipeline_samples.append(sec_i)
        pipeline_sec = min(pipeline_sec, sec_i)
    shutil.rmtree(out, ignore_errors=True)
    docs_per_sec = n_docs / pipeline_sec
    q_times["pipeline"] = round(pipeline_sec, 3)
    q_samples["pipeline"] = [round(s, 3) for s in pipeline_samples]
    log(f"pipeline (both windows): best {pipeline_sec:.2f}s = {docs_per_sec:.0f} docs/sec")

    # Noise summary so round-over-round comparisons can tell drift from
    # regression: rel_spread = (max - min) / min per query over the 3
    # warm samples.  A query whose round delta is inside its own spread
    # is noise, not a code change.  Guard the denominator: a sub-ms
    # sample rounds to 0.0 in q_samples, and a ZeroDivisionError here
    # would discard the whole already-measured result.
    spreads = {
        name: round((max(s) - min(s)) / max(min(s), 1e-6), 3)
        for name, s in q_samples.items()
    }
    ranked = sorted(spreads.values())
    noise = {
        "median_rel_spread": ranked[len(ranked) // 2],
        "max_rel_spread": max(spreads.items(), key=lambda kv: kv[1]),
    }
    log(f"noise: {noise}")

    print(
        json.dumps(
            {
                "metric": "pipeline_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "queries": q_times,
                "query_samples": q_samples,
                "rel_spread": spreads,
                "noise": noise,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "n_docs": n_docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
