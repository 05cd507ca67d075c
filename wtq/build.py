"""End-to-end training-data build: ONE entry point composing the whole
curation stack the way a production corpus build runs it.

    pages ─ quality filter (+ boilerplate strip, + host gate)
          ─ optional model-based quality gate (seed-trained NB scorer,
            zero-shuffle scoring pass — wtq/operators/classifier.py)
          ─ near-dup removal (exact-first LSH clusters, keep min-id rep)
          ─ benchmark decontamination (held-out hash-slice of the corpus,
            or an explicit benchmark gram table)
          ─ per-host token budget
          ─ train/val/test split (url-hash buckets; leakage bounded by
            the upstream dedup stage — see build_training_set)
          → parquet per split + a one-row-per-stage lineage table

Every stage is individually oracle-gated elsewhere (wtq.queries /
tests); this module adds the composition contract: stages only remove
documents (conservation), the split partitions the survivors exactly,
and the whole build is a pure function of its input (content-hash
ordering everywhere — rerunning yields byte-identical membership).

Scale shape: each stage is the operator documented in SCALE.md; the
composition adds no new shuffle beyond its stages (the lineage table
is a union of per-stage counts — driver-sized, never data).  The one
optional extra pass is the LSH bucket-occupancy audit (`lsh_audit`),
which re-runs the signature UDF over the exact-dedup representatives
to record over-cap bucket counts in the lineage — the observability a
production dedup run wants, priced at one additional narrow pass over
the post-collapse survivor set."""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wtq.operators import curation as C
from wtq.operators.classifier import nb_score, train_nb_weights
from wtq.operators.dedup import LSH_BUCKET_CAP, dedup_resolution
from wtq.pipeline import run_pipeline

# one url in BENCH_SLICE_MOD seeds the held-out benchmark slice when no
# explicit benchmark is given (md5-bucketed — works for string ids,
# unlike the numeric id-parity split of the standalone query demo)
BENCH_SLICE_MOD = 101


def _hash_bucket(col: str, mod: int):
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("long") % mod
    )


@dataclass
class BuildResult:
    out_dir: str
    lineage: DataFrame  # (stage, n_docs) — doc stages monotone non-increasing

    def split_path(self, split: str) -> str:
        return os.path.join(self.out_dir, f"split={split}")


def build_training_set(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    num_partitions: int | None = None,
    token_budget: int = C.TOKEN_BUDGET,
    benchmark: DataFrame | None = None,
    lsh_bucket_cap: int = LSH_BUCKET_CAP,
    lsh_audit: bool = True,
    normalize_urls: bool = False,
    classifier_seed: DataFrame | None = None,
    classifier_min_micro: int = 0,
) -> BuildResult:
    """Run the full curation stack and write train/val/test parquet.

    `benchmark`: optional 1-column gram-digest table (see
    `benchmark_grams`).  When None, a deterministic held-out slice of
    the corpus itself (md5(url) bucket 0 of BENCH_SLICE_MOD) plays the
    benchmark role and is excluded from every split — the
    self-contained analog of decontaminating against a real eval
    suite.

    `classifier_seed`: optional labeled seed (columns `text`,
    `y` boolean) enabling the model-based quality gate between the
    rule battery and the dedup stage; docs scoring ≤
    `classifier_min_micro` (micro-log-odds, default 0 = "negatives
    more likely") are dropped and the lineage gains a
    `15_classifier_kept` row.

    `lsh_bucket_cap` is applied to the dedup stage's pair expansion AND
    to the occupancy audit, so the audit always reports on the cap the
    pair stage actually enforced.  `lsh_audit=False` skips the audit
    pass (and its two lineage rows) when the extra signature pass is
    not worth the observability — e.g. repeated small test builds.

    Returns BuildResult with the split paths and the lineage table;
    splits are written with (url, text, n_tokens) columns.  Lineage has
    two row families: `NN_*` document counts (monotone non-increasing
    through the stages) and, when `lsh_audit`, `6N_lsh_*` audit gauges
    (over-cap bucket count and max bucket size — NOT document counts).
    """
    # 1. quality filter with both curation passes (+ optional url
    # canonicalization ahead of the re-crawl window — when on, every
    # downstream url-keyed stage, the split included, keys on the
    # canonical form).  Round-6: default the pipeline's partition
    # count to the configured parallelism — the Arrow score stage is
    # CPU-bound, not byte-bound, so AQE's byte-targeted coalescing of
    # the url exchange under-parallelizes it (measured ~8% on the
    # curated chain at sf1.0); build outputs are partitioning-
    # independent (content-hash membership), so this changes no rows.
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    # the 00_input lineage count (distinct urls of the raw input) is
    # independent of every stage — run it from a driver thread so its
    # scan back-fills executors behind the pipeline's stragglers
    # (guide §2.6) instead of serializing at the end
    from concurrent.futures import ThreadPoolExecutor

    _pool = ThreadPoolExecutor(max_workers=4)
    _fut_input = _pool.submit(
        lambda: spark.read.parquet(pages_path).select("url").distinct().count()
    )
    decided = run_pipeline(
        spark,
        pages_path,
        num_partitions=num_partitions,
        strip_boilerplate=True,
        host_gate=True,
        normalize_urls=normalize_urls,
    ).decided
    kept = decided.filter("keep").select("url", "text")
    # the chain is re-used by several counting/writing consumers below;
    # materialize once (the CTAS-at-fan-out discipline).  Same for the
    # dedup and decontamination survivors: without their checkpoints
    # the lineage counts at the bottom re-executed the LSH + connected-
    # components chain and the decontamination join a second and third
    # time (round-4 advisory — measured as the build's dominant
    # redundant cost at scale).
    kept = kept.localCheckpoint(eager=True)
    quality_kept = kept  # pre-gate frame: stage-10 lineage counts this

    # 1b. optional model-based gate (the CCNet/GPT-3 classifier layer):
    # train closed-form NB log-odds on the caller's labeled seed
    # (columns: text, y boolean — True = quality reference, False =
    # raw-crawl negatives) and keep docs scoring above the threshold.
    # Runs BEFORE the near-dup stage on purpose: scoring is a
    # zero-shuffle broadcast-map pass (a free rider on the kept scan),
    # while LSH + connected components is the build's most expensive
    # stage — gating first shrinks its input.  score_micro is an exact
    # BIGINT, so the kept set is bit-stable at any parallelism.
    classifier_count: dict[str, int] = {}
    if classifier_seed is not None:
        weights, consts = train_nb_weights(
            classifier_seed, text_col="text", label_col="y"
        )
        kept = (
            nb_score(kept, weights, consts, text_col="text", id_cols=("url", "text"))
            .filter(F.col("score_micro") > classifier_min_micro)
            .select("url", "text")
            .localCheckpoint(eager=True)
        )
        classifier_count["15_classifier_kept"] = kept.count()

    # 2. near-dup removal: keep each cluster's min-id representative.
    # When auditing, the resolution shares ONE materialized bucket
    # table between pair generation and the occupancy stats (round-6:
    # the audit previously re-ran exact_representatives + the whole
    # signature UDF pass a second time — the build's largest redundant
    # cost; the shared table is ids-only, so the checkpoint is cheap
    # and the audited cap is by construction the cap the pair stage
    # enforced).
    stats = None
    if lsh_audit:
        labels, stats = dedup_resolution(
            kept, "url", "text", bucket_cap=lsh_bucket_cap,
            with_bucket_stats=True, rebalance=False,
        )
    else:
        labels = dedup_resolution(
            kept, "url", "text", bucket_cap=lsh_bucket_cap, rebalance=False
        )
    non_reps = (
        labels.filter(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias("url"))
    )
    deduped = kept.join(non_reps, "url", "left_anti").localCheckpoint(eager=True)

    # 2b. occupancy audit gauges (see above: measured over the exact-
    # dedup representative set the pair stage consumed).  The bucket
    # table is already materialized at this point, so the histogram
    # aggregation is independent of everything downstream — submit it
    # from a driver thread (guide §2.6) and collect the row when the
    # lineage is assembled.
    _fut_audit = None
    if lsh_audit:
        _fut_audit = _pool.submit(
            lambda: stats.agg(
                F.coalesce(
                    F.sum(F.when(F.col("over_cap"), F.col("n_buckets"))), F.lit(0)
                ).alias("n_over"),
                F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_size"),
            ).collect()[0]
        )

    # 3. decontamination
    if benchmark is None:
        bench_docs = deduped.filter(_hash_bucket("url", BENCH_SLICE_MOD) == 0)
        benchmark = C.benchmark_grams(bench_docs, "text")
        candidates = deduped.filter(_hash_bucket("url", BENCH_SLICE_MOD) != 0)
    else:
        candidates = deduped
    hits = C.decontaminate(candidates, "url", "text", benchmark=benchmark)
    clean = candidates.join(hits.select("url"), "url", "left_anti").localCheckpoint(
        eager=True
    )

    # 4. per-host token budget (host = authority component of the url)
    hosted = clean.withColumn("host", F.substring_index("url", "/", 3))
    sampled = C.token_budget_sample(
        hosted, "url", "text", "host", budget=token_budget
    ).select("url", "n_tokens")
    final = clean.join(sampled, "url").localCheckpoint(eager=True)

    # 5. train/val/test split: md5(url) buckets (98/1/1), a pure
    # function of the url — stable across reruns and cluster sizes.
    # Leakage: EXACT-duplicate content cannot straddle splits because
    # the upstream exact-dedup stage collapses identical text to one
    # survivor regardless of url; near-duplicates above the LSH
    # threshold are likewise collapsed to one representative.  The
    # residual risk — near-identical content BELOW the similarity
    # threshold (or too short to shingle) surviving under different
    # urls — straddles with probability proportional to the bucket
    # split, and no split key fixes that (a content hash differs on
    # near-identical text too); only a tighter dedup threshold does.
    bucket = _hash_bucket("url", 1000)
    split = (
        F.when(bucket < 980, "train").when(bucket < 990, "val").otherwise("test")
    )
    final = final.withColumn("split", split)
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    # every stage frame is checkpointed/written at this point, so the
    # five lineage counts are independent tiny jobs — run them
    # concurrently (guide §2.6: back-fill, don't serialize)
    stage_frames = {
        "10_quality_kept": quality_kept,
        "20_after_dedup": deduped,
        "30_after_decontam": clean,
        "40_after_budget": final,
        "50_written": spark.read.parquet(out_dir),
    }
    count_futs = {k: _pool.submit(df.count) for k, df in stage_frames.items()}
    counts = {"00_input": _fut_input.result()}
    counts.update({k: f.result() for k, f in count_futs.items()})
    counts.update(classifier_count)
    audit: dict[str, int] = {}
    if _fut_audit is not None:
        row = _fut_audit.result()
        audit = {
            "60_lsh_over_cap_buckets": row.n_over,
            "61_lsh_max_bucket_size": row.max_size,
        }
    counts.update(audit)
    _pool.shutdown()
    lineage = spark.createDataFrame(
        sorted(counts.items()), "stage string, n_docs long"
    )
    return BuildResult(out_dir=out_dir, lineage=lineage)
