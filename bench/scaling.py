#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors).

No real cluster in this sandbox, so the same job runs at two local
parallelism levels — local[N] vs local[4N] (N via $WTQ_SCALE_N) — on
the same input, each in a fresh JVM (subprocess); efficiency is
(throughput_4N / throughput_N) / 4.  local[32] is also run for the
absolute-throughput context row.  Results land in BENCH/BASELINE.md.

N defaults to 2. Caveat measured on this VM: a raw multiprocessing
burn (no Spark) shows the hardware itself delivers only ~0.87 at 2→8
processes and ~0.66 at 32 (SMT + per-core clock scaling), so local-
mode core counts understate multi-executor scaling, where added
executors bring their own cores.

Usage: [WTQ_SCALE_N=n] python bench/scaling.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, __REPO__)
from wtq.generate import ensure_pages
from wtq.pipeline import decisions_view, run_pipeline
from wtq.session import get_spark
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicate = int(sys.argv[3])
pages_path = ensure_pages(sf_dir, replicate=replicate)
spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
# warmup (codegen + python worker imports), not timed
run_pipeline(spark, pages_path, num_partitions=cpus).decided.agg(F.sum(F.size("fired_rules"))).collect()  # count(*) would prune the UDF
out = tempfile.mkdtemp(prefix="wtq_scaling_")
# Sink = the decisions table (url, keep, fired_rules): the north
# metric is FILTER throughput. The full scrub/langid/ppl/stats compute
# still runs (fired_rules depends on all of it) but the job is not
# bottlenecked on serializing scrubbed text to the sandbox's single
# ~350 MB/s disk, which no amount of cores can speed up.
best = None
for _ in range(3):  # best-of-3: the sandbox VM has noisy neighbors
    t0 = time.time()
    # one Arrow partition per core (see bench.py: 4x over-split measured 37% slower)
    res = run_pipeline(spark, pages_path, num_partitions=cpus)
    decisions_view(res.decided).write.mode("overwrite").parquet(f"{out}/decisions")
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
n = spark.read.parquet(f"{out}/decisions").count()
shutil.rmtree(out, ignore_errors=True)
# Heavy non-pipeline operator shapes (round-2 verdict item 9): the
# iterative-join CC resolution and the explode-heavy tf-idf, so the
# scaling story covers more than the narrow Arrow pass.
ops = {}
from wtq.queries import QUERIES
for name in ("dedup_clusters", "tfidf_top_terms"):
    QUERIES[name](spark, sf_dir).collect()  # warmup (codegen)
    best_op = None
    for _ in range(3):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).collect()
        dt = time.time() - t0
        best_op = dt if best_op is None or dt < best_op else best_op
    ops[name] = round(best_op, 3)
print(json.dumps({"cpus": cpus, "n_docs": n, "sec": round(best, 3),
                  "docs_per_sec": round(n / best, 1), "ops_sec": ops}))
spark.stop()
"""


def run_at(cpus: int, sf_dir: str, replicate: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("__REPO__", repr(REPO)), str(cpus), sf_dir, str(replicate)],
        capture_output=True, text=True, timeout=1200,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-3000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def _burn_worker(args) -> int:
    deadline, = args
    x = 0
    while time.time() < deadline:
        x += 1
    return x


def hardware_ceiling(procs: int, seconds: float = 6.0) -> float:
    """Raw multiprocessing increments/sec at `procs` workers — measures
    what the VM's cores actually deliver, Spark excluded."""
    import multiprocessing as mp

    with mp.Pool(procs) as pool:
        deadline = time.time() + seconds
        total = sum(pool.map(_burn_worker, [(deadline,)] * procs))
    return total / seconds


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # big enough that compute dominates fixed costs (~85k docs at the
    # default replicate; at 40k the job is overhead-bound)
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    # Hardware ceiling first (measured, not asserted): the VM's 32
    # advertised cores deliver well under 32x of one core's throughput
    # (SMT + hypervisor steal + clock scaling), which bounds any 8->32
    # reading even for embarrassingly parallel work.
    burn = {p: hardware_ceiling(p) for p in (1, 2, 8, 32)}
    ceil_2_8 = (burn[8] / burn[2]) / 4.0
    ceil_8_32 = (burn[32] / burn[8]) / 4.0
    print(f"hardware ceiling: 2->8 {ceil_2_8:.2f}, 8->32 {ceil_8_32:.2f}", file=sys.stderr)

    # Both requested rows, measured in the same session: the original
    # 8->32 criterion AND the 2->8 row where the hardware genuinely has
    # 4x capacity.  local[8] serves as 4N of the first pair and N of
    # the second.
    #
    # TWO interleaved passes per level (2, 8, 32, 2, 8, 32), best per
    # level: the VM's effective capacity drifts on a minutes scale
    # (noisy neighbors), and a single sequential sweep hands each level
    # a different machine — measured round 3: the same local[8] job at
    # 5309 and 6197 docs/sec twenty minutes apart, which alone moves
    # the 2→8 efficiency reading by 0.1.
    def best(a: dict, b: dict) -> dict:
        # the whole winning PASS is reported — pipeline docs_per_sec
        # AND that same pass's per-op seconds, so every published row
        # is one run's coherent measurement (mixing per-op minima
        # across passes would fabricate a run nobody executed)
        return dict(a if a["docs_per_sec"] >= b["docs_per_sec"] else b)

    passes = []
    for i in range(2):
        row = {c: run_at(c, sf_dir, replicate) for c in (2, 8, 32)}
        print(f"pass {i}:", {c: row[c]["docs_per_sec"] for c in row}, file=sys.stderr)
        passes.append(row)
    r2 = best(passes[0][2], passes[1][2])
    r8 = best(passes[0][8], passes[1][8])
    r32 = best(passes[0][32], passes[1][32])
    print("local[2]:", r2, file=sys.stderr)
    print("local[8]:", r8, file=sys.stderr)
    print("local[32]:", r32, file=sys.stderr)
    eff_2_8 = (r8["docs_per_sec"] / r2["docs_per_sec"]) / 4.0
    eff_8_32 = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    op_eff_2_8 = {
        name: round((r2["ops_sec"][name] / r8["ops_sec"][name]) / 4.0, 3)
        for name in r2.get("ops_sec", {})
    }
    result = {
        "n2": r2, "n8": r8, "n32": r32,
        "efficiency_2_8": round(eff_2_8, 3),
        "efficiency_8_32": round(eff_8_32, 3),
        "op_efficiency_2_8": op_eff_2_8,
        "hw_ceiling_2_8": round(ceil_2_8, 3),
        "hw_ceiling_8_32": round(ceil_8_32, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

Input: synthetic pages derived from `{sf_dir}` (replicate={replicate},
{r2['n_docs']} docs after re-crawl dedup). Same job, same input, three
parallelism levels, fresh JVM each; two interleaved passes over
(2, 8, 32), best per level — interleaving keeps minutes-scale host
drift from handing each level a different machine (noisy-neighbor VM).
Sink = decisions table (the north metric is FILTER throughput; the
full scrub/langid/perplexity/stats compute runs either way).

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[2]  | {r2['sec']} | {r2['docs_per_sec']} |
| local[8]  | {r8['sec']} | {r8['docs_per_sec']} |
| local[32] | {r32['sec']} | {r32['docs_per_sec']} |

Both N→4N readings, against the measured hardware ceiling (a raw
multiprocessing burn with no Spark, same session — the most any
perfectly parallel job could show on these virtual cores):

| N→4N | measured efficiency | hardware ceiling | efficiency vs ceiling |
|---|---|---|---|
| 2→8  | **{eff_2_8:.3f}** | {ceil_2_8:.3f} | {eff_2_8 / ceil_2_8:.3f} |
| 8→32 | **{eff_8_32:.3f}** | {ceil_8_32:.3f} | {eff_8_32 / ceil_8_32:.3f} |

Target ≥ 0.8 (north rule). The 2→8 row is the honest probe of the
multi-executor criterion — on a real cluster added executors bring
their OWN cores, so per-executor capacity is constant; on this VM the
8→32 step shares SMT siblings and hypervisor-stolen cycles, and the
burn shows the hardware itself cannot reach 0.8 there.  Both rows are
reported so the original-criterion number stays visible.

Heavy operator shapes at the same three levels (best-of-2 interleaved
wall sec; 2→8 efficiency = (t₂/t₈)/4):

| operator | local[2] | local[8] | local[32] | 2→8 efficiency |
|---|---|---|---|---|
| dedup_clusters (LSH pairs + pointer-jump CC) | {r2['ops_sec']['dedup_clusters']} | {r8['ops_sec']['dedup_clusters']} | {r32['ops_sec']['dedup_clusters']} | {op_eff_2_8['dedup_clusters']:.3f} |
| tfidf_top_terms (explode + broadcast DF + window top-k) | {r2['ops_sec']['tfidf_top_terms']} | {r8['ops_sec']['tfidf_top_terms']} | {r32['ops_sec']['tfidf_top_terms']} | {op_eff_2_8['tfidf_top_terms']:.3f} |

Iterative/explode-heavy shapes carry fixed per-round JVM/driver costs
(CC runs ~4 synchronous rounds with localCheckpoint barriers), so
their local-mode efficiency reads below the pipeline's; the pipeline
row is the north-rule metric.

Pipeline measured end-to-end: parquet scan (html pruned) → salted
murmur3(url) repartition → window re-crawl dedup (reuses the exchange)
→ single Arrow scrub/langid/perplexity/stats pass → codegen'd
threshold rules → decisions parquet sink.

Measured {time.strftime('%Y-%m-%d %H:%M:%S')} on a 32-core VM
(timings vary with host contention; efficiency is the stable metric).
"""
        )
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
