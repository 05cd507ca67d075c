"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's duplicate detection is `group by geom having count(*) > 1`
(proccess_data.sql:204-213,222-233 — SURVEY.md §2.4 A6/J8) plus a
canonicalized theta self-join for overlaps (`w1.id > w2.id …`,
proccess_data.sql:243-248 — J4).  These operators are the web-text
generalization: exact dedup is the same having-count pattern on a
content hash; near-dup uses LSH banding so the pairwise comparison
only ever happens *within* hash buckets, never as a global cross join
(the J4 note in SURVEY.md §2.3).

Determinism contract: every hash is derived from md5 (lowercase hex),
mapped to a 60-bit integer, then reduced with explicit integer
arithmetic — reproducible bit-for-bit in any engine (the DuckDB
oracle builds the same numbers from the same SQL-visible md5), unlike
engine-native hash() functions which differ between Spark and DuckDB.

Scale notes (100 TB):
  * token hashing + minhash is a narrow map; the only shuffles are the
    (doc band-bucket) exchange and the bucket self-join — both keyed
    on uniformly-distributed hashes, so no skew.
  * bucket self-join is quadratic only within a bucket; band/row
    parameters bound expected bucket size.  AQE skew-join is the
    backstop for adversarial buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---- shared constants (Spark AND oracle SQL are generated from these) ----
MINHASH_P = 2147483647  # 2^31-1 (Mersenne prime): a*h < 2^62 — no int64 overflow
                        # under Spark's ANSI arithmetic or DuckDB BIGINT
N_PERM = 16
LSH_ROWS = 2  # rows per band
LSH_BANDS = N_PERM // LSH_ROWS  # 8 bands
SHINGLE_K = 3
SIMHASH_BITS = 60

# fixed affine permutation parameters (a != 0, deterministic spread)
PERM_A = [(i * 2654435761 + 1) % MINHASH_P for i in range(1, N_PERM + 1)]
PERM_B = [(i * 40503 + 17) % MINHASH_P for i in range(1, N_PERM + 1)]


# ---------------------------------------------------------------------------
# Spark-side building blocks
# ---------------------------------------------------------------------------

def token_hash(col: Column) -> Column:
    """60-bit integer hash of a string via md5 hex → mod 2^32-5 prime.
    `conv(substr(md5(x),1,15),16,10)` is exactly reproducible in the
    DuckDB oracle as `cast('0x'||substr(md5(x),1,15) as bigint)`."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast("long")
        % MINHASH_P
    )


def words_arr(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: w != "")


def shingles_arr(text: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles via index-transform over the word array —
    no explode needed until hashing."""
    w = words_arr(text)
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    mk = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)])
    )
    return F.when(n >= k, mk).otherwise(F.array())


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup — the A6 having-count pattern."""
    fp = F.md5(F.encode(F.col(text_col), "UTF-8")).alias("fp")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("representative"))
    )


def _md5_60(s: str) -> int:
    """int(md5(s).hexdigest()[:15], 16) — the first 60 bits of md5 —
    via the digest bytes directly (~2× faster than hex parsing;
    asserted equal in tests)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big") >> 4


# Cross-batch memo of shingle→hash.  Web shingles repeat heavily
# (boilerplate, quotes, templates); bounding the dict keeps executor
# memory flat on adversarial input.
_HASH_MEMO: dict[str, int] = {}
_HASH_MEMO_MAX = 1 << 20


def _shingle_hashes(shingles) -> "list[int]":
    memo = _HASH_MEMO
    if len(memo) > _HASH_MEMO_MAX:
        memo.clear()
    out = []
    for x in shingles:
        h = memo.get(x)
        if h is None:
            h = memo[x] = _md5_60(x) % MINHASH_P
        out.append(h)
    return out


def _sig_batch(texts) -> list[list[int]]:
    """Vectorized minhash core (numpy): identical arithmetic to the SQL
    oracle — md5-hex→int60 mod P, then min over (a·h+b) mod P.
    a·h < 2^62 so int64 never overflows."""
    import numpy as np

    A = np.asarray(PERM_A, dtype=np.int64)[:, None]
    B = np.asarray(PERM_B, dtype=np.int64)[:, None]
    out = []
    sentinel = [MINHASH_P] * N_PERM
    for t in texts:
        words = [w for w in (t or "").split(" ") if w]
        if len(words) < SHINGLE_K:
            out.append(sentinel)
            continue
        shingles = {
            " ".join(words[i : i + SHINGLE_K]) for i in range(len(words) - SHINGLE_K + 1)
        }
        hs = np.array(_shingle_hashes(shingles), dtype=np.int64)
        out.append(((A * hs + B) % MINHASH_P).min(axis=1).tolist())
    return out


@F.pandas_udf(T.ArrayType(T.LongType()))
def _sig_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(_sig_batch(texts))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_partitions: int | None = None,
    rebalance: bool = True,
) -> DataFrame:
    """(id, sig array<long>[N_PERM]): per-permutation min over shingle
    hashes of (a·h+b) mod P.

    Arrow-batched numpy implementation. Two slower shapes were measured
    and rejected: explode-shingles × explode-perms + groupBy shuffles
    |docs|·|shingles|·N_PERM rows through an aggregation; pure
    higher-order expressions are interpreted (no codegen) and pay
    O(|shingles|²) array_distinct plus the md5 hash re-inlined into
    every lambda body by projection collapsing — ~100× slower than this
    batch.  The DuckDB oracle (sql_minhash_lsh_pairs) reproduces the
    arithmetic bit-for-bit from the SQL-visible md5.  Docs with no
    shingle get sentinel MINHASH_P (real minvals are always < P).
    """
    # rebalance: signature compute is the heavy narrow stage, and a
    # single giant input split would serialize it.  Exactly one split
    # per core — over-splitting (4× was measured) doubles wall time at
    # this batch size from per-task Arrow/scheduling overhead.
    # Round-6: callers whose input is ALREADY split at least core-wide
    # (the registry rebalance, the build's checkpointed kept set) pass
    # rebalance=False and skip the exchange — it only re-moved every
    # text.  The skip is a caller-declared flag, NOT runtime
    # introspection: df.rdd.getNumPartitions() on an AQE plan that
    # contains an exchange EXECUTES that exchange stage to finalize
    # the plan, paying the shuffle twice (measured as a regression
    # before this flag).
    base = df.select(F.col(id_col), F.col(text_col))
    if rebalance:
        base = base.repartition(
            num_partitions or df.sparkSession.sparkContext.defaultParallelism
        )
    return base.select(F.col(id_col), _sig_udf(F.col(text_col)).alias("sig"))


def _band_strs() -> Column:
    """Band-bucket strings derived from the `sig` array column — one
    "band:min1,min2" key per band, built narrow (no shuffle)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
        lambda b: F.concat_ws(
            ":",
            b.cast("string"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(LSH_ROWS - 1)),
                    lambda r: F.element_at(F.col("sig"), (b * LSH_ROWS + r + 1).cast("int")).cast("string"),
                ),
                ",",
            ),
        ),
    )


# Max docs per LSH bucket before pair expansion degrades from
# ALL-PAIRS to STAR edges.  A bucket only exceeds this when MANY
# near-identical documents share a band value; the exact-dedup-first
# discipline in dedup_resolution already collapses byte-identical
# floods, so an overflow here means a near-but-not-exact boilerplate
# flood — whose C(n,2) pair expansion is exactly what must not run.
# Over-cap buckets emit (bucket-min, member) edges instead: LINEAR in
# bucket size, every edge still a true candidate (both endpoints share
# the band by construction), and the bucket stays ONE connected
# component for the cluster consumers — so capping costs ZERO
# cluster-level recall (pinned in test_lsh_cap_recall) instead of
# round-3's drop-the-bucket behavior, which lost near-identical
# floods entirely.  Cap² bounds the worst-case per-bucket all-pairs
# volume (~500k pairs at 1000).  The oracle SQL applies the IDENTICAL
# cap and star rule, so the cross-engine differential holds on flood
# inputs too.
LSH_BUCKET_CAP = 1000


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_cap: int = LSH_BUCKET_CAP,
    rebalance: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs via banding: docs sharing ALL row
    minvalues in ≥1 band.  Returns (doc1, doc2, n_shared_bands) with
    doc1 < doc2 (canonical pair ordering, cf. proccess_data.sql:244).

    Buckets with more than `bucket_cap` docs emit STAR edges
    (bucket-min ↔ member) instead of all-pairs (see LSH_BUCKET_CAP):
    output stays linear in bucket size, every emitted pair is still a
    genuine shared-band candidate, and cluster connectivity is
    preserved exactly; `sql_minhash_lsh_pairs` mirrors the cap and the
    star rule so both engines emit exactly the same pairs."""
    # NOTE: do NOT filter on the signature column here — a filter
    # referencing the UDF output gets pushed below the repartition and
    # Catalyst materializes a SECOND ArrowEvalPython over the unsplit
    # scan (measured: the whole signature pass re-ran serially).
    # Shingle-less docs are dropped at the bucket level instead, where
    # the Generate node blocks pushdown.
    buckets = _minhash_buckets(df, id_col, text_col, rebalance=rebalance)
    # Within-bucket pairs via ONE aggregation + double explode instead
    # of a bucket self-join: a self-join duplicates the whole upstream
    # subtree, so the signature UDF would run TWICE (measured 2× the
    # operator's wall time).  This is the Spark analog of the
    # reference's materialize-the-CTE-before-self-join fix
    # (proccess_data.sql:450-467).
    #
    # Bucket-size bound: uniform hashing bounds EXPECTED bucket size,
    # but identical/near-identical documents share every band value by
    # construction, so a duplicate-saturated corpus would collapse a
    # whole duplicate family into one collect_list row (single-task
    # hotspot, 2 GB-row hazard).  Two defenses: (a) the cluster-level
    # consumers (dedup_resolution/dedup_clusters/dedup_apply) run
    # EXACT-DEDUP-FIRST and feed this operator one representative per
    # exact fingerprint, so byte-identical floods never reach a bucket;
    # (b) LSH_BUCKET_CAP degrades residual oversized buckets (near-
    # but-not-exact boilerplate floods) from all-pairs to star edges
    # rather than quadratically exploding — the n-gram path's
    # NGRAM_DF_CAP discipline, minus its recall loss.  Over-cap
    # buckets are observable via lsh_bucket_stats.  Memory bound of
    # the one collect_list row for a monster bucket: IDS ONLY (text
    # never enters this operator's shuffle), so a B-member bucket
    # costs ~8·B bytes in one aggregation buffer — a 10⁸-member flood
    # is ~0.8 GB, inside a single task's budget; beyond that, raise
    # the exact-dedup-first net upstream (byte-identical floods never
    # reach here) before raising executor memory.
    #
    return _pairs_from_buckets(buckets, bucket_cap)


def _pairs_from_buckets(buckets: DataFrame, bucket_cap: int) -> DataFrame:
    """Pair generation over a (doc, bucket) table — the back half of
    minhash_lsh_pairs, factored out (round-6) so a caller that also
    audits occupancy (wtq/build.py) can feed BOTH consumers from one
    materialized bucket table instead of running the signature UDF
    twice.

    One conditional explode handles both regimes without touching
    the upstream subtree twice: the LEFT side of the pair is every
    member for within-cap buckets but only the bucket minimum for
    over-cap buckets — [min] × members = the star."""
    grouped = (
        buckets.groupBy("bucket")
        .agg(F.collect_list("doc").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    pairs = (
        grouped.select(
            F.explode(
                F.when(F.size("docs") <= bucket_cap, F.col("docs")).otherwise(
                    F.array(F.array_min("docs"))
                )
            ).alias("doc"),
            F.col("docs"),
        )
        .select("doc", F.explode("docs").alias("doc2"))
        .filter(F.col("doc") < F.col("doc2"))
        .groupBy(F.col("doc").alias("doc1"), F.col("doc2"))
        .agg(F.count("*").alias("n_shared_bands"))
    )
    return pairs


def _minhash_buckets(
    df: DataFrame, id_col: str, text_col: str, rebalance: bool = True
) -> DataFrame:
    """(doc, bucket) band-bucket rows — the shared derivation behind
    pair generation AND the occupancy audit (one definition, so the
    audit always reports on exactly the buckets pairing builds).

    Sentinel docs (no shingles) carry minvals == P in every slot; real
    minvals are always < P, so their buckets are exactly ":P,…,P" —
    dropping those buckets removes them from pairing entirely (the
    explode-form oracle simply emits no rows for such docs).  Still
    narrow: the ONLY shuffle in the operator is downstream of this."""
    sig = minhash_signatures(df, id_col, text_col, rebalance=rebalance)
    sentinel_bucket = ":" + ",".join([str(MINHASH_P)] * LSH_ROWS)
    return sig.select(
        F.col(id_col).alias("doc"), F.explode(_band_strs()).alias("bucket")
    ).filter(~F.col("bucket").endswith(sentinel_bucket))


def lsh_bucket_stats(
    df: DataFrame, id_col: str, text_col: str, bucket_cap: int = LSH_BUCKET_CAP
) -> DataFrame:
    """Bucket-occupancy audit for minhash LSH: one row per bucket size
    with the number of buckets that size and whether they exceed
    `bucket_cap` — the observability hook for the cap's drop path.
    Pass the SAME bucket_cap given to minhash_lsh_pairs /
    simhash_near_pairs, or the over_cap flag audits a different cap
    than the one that dropped buckets."""
    return _bucket_stats_from_buckets(
        _minhash_buckets(df, id_col, text_col), bucket_cap
    )


def _bucket_stats_from_buckets(buckets: DataFrame, bucket_cap: int) -> DataFrame:
    """Occupancy histogram over a (doc, bucket) table — shared by the
    standalone audit above and the single-signature-pass resolution
    path (round-6)."""
    return (
        buckets.groupBy("bucket")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .withColumn("over_cap", F.col("bucket_size") > bucket_cap)
    )


NGRAM_DF_CAP = 50  # shingles in more docs than this are boilerplate


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, top_n: int = 20) -> DataFrame:
    """Exact shingle-set Jaccard for pairs sharing ≥1 shingle — inverted
    index join, never a cross join. Returns top_n pairs by similarity
    (deterministic tie-break doc1, doc2).

    Document-frequency cutoff: shingles appearing in > NGRAM_DF_CAP
    docs (navigation chrome, legal footers, quoted templates) are
    dropped BEFORE the self-join — a posting list of length d yields
    d·(d-1)/2 join rows, so one boilerplate shingle across the corpus
    is a quadratic blow-up; the cap bounds every posting list.  Both
    set sizes and intersections are computed on the capped shingle
    set, so the Jaccard stays a true set similarity (over informative
    shingles) and the oracle mirrors it exactly."""
    raw = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles_arr(F.col(text_col)))).alias("shingle"),
    )
    # df-cap as a WINDOW count over one exchange (the oracle's QUALIFY
    # shape): the scan + shingle explode sits BELOW the shingle
    # exchange, so Spark's ReusedExchange computes it once even though
    # `sh` feeds both sizes and postings; the window count spills per
    # partition instead of collecting a hot shingle's full posting
    # list into one array (a separate groupBy-count + anti-join — the
    # round-2 first cut — re-ran the whole explode subtree per
    # consumer).
    w = Window.partitionBy("shingle")
    sh = (
        raw.withColumn("df", F.count("*").over(w))
        .filter(F.col("df") <= NGRAM_DF_CAP)
        .drop("df")
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    # posting-list pair generation via ONE aggregation + double explode
    # (not a self-join, which would evaluate the shingle-explode
    # subtree twice — see minhash_lsh_pairs); the df-cap above bounds
    # every posting list, so collect_list stays small, and groupBy
    # (shingle) reuses the window's clustering — no extra exchange
    postings = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    inter = (
        postings.select(F.explode("docs").alias("d1"), F.col("docs"))
        .select("d1", F.explode("docs").alias("d2"))
        .filter(F.col("d1") < F.col("d2"))
        .groupBy(F.col("d1").alias("doc1"), F.col("d2").alias("doc2"))
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc").alias("doc1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc").alias("doc2"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
        .orderBy(F.col("jaccard").desc(), "doc1", "doc2")
        .limit(top_n)
        .select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))
    )


CC_MAX_ITERS = 20


# Edge-count ceiling for the single-task union-find fast path.  The
# economics are the broadcast-join argument applied to graphs: 5M
# (src, dst) id pairs is well under a gigabyte in one task's memory,
# and ONE task doing an O(E α(E)) union-find beats O(log diameter)
# rounds of distributed hash joins over the same data on ANY cluster
# size — each pointer-jumping round costs at least one full shuffle of
# the edge set plus a driver synchronization.  Above the ceiling the
# distributed pointer-jumping loop engages (the 100 TB path: the LSH
# pair graph can approach corpus size on a duplicate-saturated crawl).
#
# The 5M figure is sized for NUMERIC ids (~8 bytes each; ~a few hundred
# MB of task memory with dict/set overhead).  String ids — url keys are
# the common case in this engine — cost 10×+ per entry in the
# union-find's Python dicts (~50-byte string objects + hash-table
# slots), so connected_components scales the effective ceiling down by
# CC_STRING_ID_DIVISOR for string edge schemas rather than letting one
# task hold several GB of url references.
CC_SINGLE_TASK_MAX_EDGES = 5_000_000
CC_STRING_ID_DIVISOR = 8


def _cc_union_find(edges: DataFrame) -> DataFrame:
    """Single-task exact CC: union-find with path compression over the
    whole (coalesced) edge list.  Output identical to the distributed
    path: (node, cluster = min reachable id), covering every node that
    appears in an edge.  Result is edge-order-independent: roots are
    re-resolved in a final pass and each component's label is its
    minimum member id.  The id type (int keys, string urls) rides
    through from the edge schema."""
    dt = edges.schema["src"].dataType.simpleString()
    schema = f"node {dt}, cluster {dt}"

    def uf(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        nodes = set()
        for pdf in batches:
            for s, d in zip(pdf["src"], pdf["dst"]):
                nodes.add(s)
                nodes.add(d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    # union by MIN id: the root of any set is always
                    # its smallest member, so the final label needs no
                    # separate min pass
                    parent[max(rs, rd)] = min(rs, rd)
        out = sorted(nodes)
        yield pd.DataFrame({"node": out, "cluster": [find(n) for n in out]})

    return edges.coalesce(1).mapInPandas(uf, schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc1",
    b_col: str = "doc2",
    single_task_max_edges: int = CC_SINGLE_TASK_MAX_EDGES,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into CLUSTERS: (node, cluster)
    where cluster = min node id reachable through the pair graph.

    A dedup pipeline keeps one representative per cluster, not per
    pair — pairs alone under-delete transitive duplicates (A~B, B~C
    must drop two of three docs).  This is the reference's
    duplicate-group resolution generalized from equality groups
    (group by geom having count>1, proccess_data.sql:204-213) to a
    similarity GRAPH.

    Two physical strategies behind one contract (the broadcast-join
    pattern applied to graphs — pick the plan by measured size):

    * edge count ≤ `single_task_max_edges` → ONE mapInPandas task runs
      union-find over the coalesced edge list (`_cc_union_find`).  The
      pair graph is duplicate-volume-sized — orders of magnitude
      smaller than the corpus after exact-dedup-first + the LSH bucket
      cap — so this is the common case even at large corpus scale, and
      a single O(E α(E)) task strictly beats log-diameter shuffle
      rounds on the same edges.
    * larger graphs → min-label propagation with POINTER JUMPING —
      each round every node takes min(own label, neighbors' labels),
      then shortcuts to its label's label (path halving).  Rounds =
      O(log diameter), not O(diameter): a 1M-node chain converges in
      ~20 rounds instead of 1M (the Hash-to-Min / GraphFrames
      construction).  Each round is distributed hash joins; the driver
      reads one scalar per round (the count of changed labels).
      localCheckpoint truncates lineage so plan size stays O(1) per
      round.

    The edge count that picks the strategy is read from the
    materialized edge checkpoint — one cheap count on 16-byte ids, the
    same runtime-statistics discipline AQE uses to pick join
    strategies."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    # width-aware ceiling: string ids (urls) cost ~10× a numeric id in
    # the single task's Python dicts — see CC_STRING_ID_DIVISOR
    cap = single_task_max_edges
    if edges.schema["src"].dataType.simpleString() == "string":
        cap //= CC_STRING_ID_DIVISOR
    if edges.count() <= cap:
        return _cc_union_find(edges)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(CC_MAX_ITERS):
        neighbor_min = (
            labels.join(edges, labels.node == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        hop = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("label").alias("prev"),
            F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
        )
        # hop feeds BOTH sides of the pointer-jump join below; without
        # truncation each round would execute the labels⋈edges join +
        # neighbor-min aggregation twice (the same duplicated-subtree
        # cost the bucket collect_list form eliminates)
        hop = hop.localCheckpoint(eager=True)
        # pointer jump (path halving): label <- label of my label.
        # Turns O(diameter) convergence into O(log diameter).
        ptr = hop.select(F.col("node").alias("p_node"), F.col("label").alias("p_label"))
        stepped = (
            hop.join(ptr, hop.label == ptr.p_node, "left")
            .select(
                "node",
                "prev",
                F.least(F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))).alias("label"),
            )
        ).localCheckpoint(eager=True)
        # convergence = no label moved this round.  The previous label
        # rides along in the SAME row, so this is a filtered count on
        # the checkpointed result — no second join, and it works for
        # ANY orderable id type (string urls included; a numeric
        # label-sum check would crash or overflow there).
        changed = stepped.filter(F.col("label") != F.col("prev")).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # with pointer jumping the reach doubles per round, so this
        # fires only for components of diameter > ~2^CC_MAX_ITERS —
        # but if it does, labels would SPLIT one logical cluster into
        # several, silently under-deleting duplicates.  Fail loudly.
        raise RuntimeError(
            f"connected_components did not converge within {CC_MAX_ITERS} "
            "pointer-jumping iterations — raise CC_MAX_ITERS or "
            "pre-contract the graph"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster"))


def exact_representatives(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative document (min id) per md5 text fingerprint —
    the exact-dedup-first front half of `dedup_resolution`, exposed so
    observability consumers (the build lineage's LSH occupancy audit,
    wtq/build.py) can measure the EXACT document set the LSH stage
    sees.  Auditing the raw corpus instead would report over-cap
    buckets that the exact collapse already defused (10⁵ byte-identical
    pages = ONE doc per band bucket), which misleads production triage.

    Deliberately mirrors (not shares) dedup_resolution's interior: the
    resolution path checkpoints its fingerprint-group table because two
    downstream consumers reuse it; this standalone form has one
    consumer and a checkpoint would just pin memory."""
    docs = df.select(
        F.col(id_col),
        F.col(text_col),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("__fp"),
    )
    multi = (
        docs.groupBy("__fp")
        .agg(F.min(id_col).alias("__rep"), F.count("*").alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__fp", "__rep")
    )
    return (
        docs.join(multi, "__fp", "left")
        .filter(F.col("__rep").isNull() | (F.col(id_col) == F.col("__rep")))
        .select(id_col, text_col)
    )


def dedup_resolution(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_cap: int = LSH_BUCKET_CAP,
    with_bucket_stats: bool = False,
    rebalance: bool = True,
):
    """Per-document cluster assignment (node, cluster) with
    EXACT-DEDUP-FIRST discipline: byte-identical documents are
    collapsed to one representative per md5 fingerprint BEFORE the LSH
    stage, so a corpus with 10⁵ identical boilerplate pages puts ONE
    doc — not 10⁵ — into each band bucket (bounded collect_list,
    linear not quadratic).  Exact-dup members are re-attached to their
    representative's cluster afterwards.  `bucket_cap` rides through to
    minhash_lsh_pairs (callers auditing occupancy via lsh_bucket_stats
    must pass the SAME cap, or the audit reports on a cap the pair
    stage never applied).

    Semantics: the same components as running LSH over the full corpus
    PLUS an edge between every exact duplicate and its group minimum —
    identical docs have identical signatures, so a rep-level LSH pair
    exists iff any member-level pair would, and cluster = min member id
    either way.  The one behavioral addition: byte-identical documents
    too short to shingle (< k words, sentinel signature) now cluster
    via their fingerprint — they ARE duplicates, and the pure-LSH form
    silently missed them.  Output covers exactly the docs in a cluster
    of ≥ 2 (pair-connected or fingerprint-connected).

    ``with_bucket_stats=True`` returns ``(labels, stats)`` where
    ``stats`` is the lsh_bucket_stats occupancy histogram over the
    SAME representative bucket table the pair stage consumed — the
    build's audit then costs one materialized ids-only bucket table
    instead of a second full signature pass (round-6)."""
    docs = df.select(
        F.col(id_col).alias("node"),
        F.col(text_col).alias("__text"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("fp"),
    )
    # TEXT NEVER ENTERS THE FINGERPRINT SHUFFLE.  The group
    # aggregation runs over (fp, node) only — 16-byte digests plus
    # ids — so even on a mostly-unique corpus the exchange moves a
    # few dozen bytes per document, not the document.  (The round-3
    # form aggregated min(struct(node, text)), which shuffled every
    # text byte once on a unique corpus: map-side partial min only
    # collapses *duplicates*.  Measured 2.3× slower at sf0.1.)
    groups = docs.select("node", "fp").groupBy("fp").agg(
        F.min("node").alias("rep"),
        F.count("*").alias("n_fp"),
    )
    # two consumers (rep text recovery + membership) — truncate so
    # the scan + fingerprint agg runs once
    groups = groups.localCheckpoint(eager=True)
    # The multi subset (fingerprints with ≥2 members) is
    # duplicate-volume-sized — tiny on a mostly-unique corpus, so AQE
    # broadcasts it into both joins below and text never shuffles at
    # all; on a duplicate-saturated corpus it degrades to a plain
    # equi-join, still linear.
    multi = groups.filter(F.col("n_fp") >= 2).select("fp", "rep", "n_fp")
    # Rep text recovery WITHOUT a corpus-sized join: a document is a
    # representative iff its fingerprint is a singleton (no `multi`
    # row) or it IS the group minimum — one left join against the
    # small `multi` side, then a filter.  Only the LSH stage ever
    # sees rep text, and it arrives join-free on the unique path.
    reps = (
        docs.join(multi.select("fp", "rep"), "fp", "left")
        .filter(F.col("rep").isNull() | (F.col("node") == F.col("rep")))
        .select(F.col("node").alias(id_col), F.col("__text").alias(text_col))
    )
    stats = None
    if with_bucket_stats:
        # ONE signature pass feeds pairing AND the occupancy audit:
        # the (doc, bucket) table is ids-only (~8 short rows per rep),
        # so the checkpoint is cheap and both consumers read it
        buckets = _minhash_buckets(
            reps, id_col, text_col, rebalance=rebalance
        ).localCheckpoint(eager=True)
        pairs = _pairs_from_buckets(buckets, bucket_cap)
        stats = _bucket_stats_from_buckets(buckets, bucket_cap)
    else:
        pairs = minhash_lsh_pairs(
            reps, id_col, text_col, bucket_cap=bucket_cap, rebalance=rebalance
        )
    cc = connected_components(pairs).select(
        F.col("node").alias("rep"), F.col("cluster").alias("cc_cluster")
    )
    # Re-expansion joins against ONLY the multi-member fingerprint
    # groups: a singleton node IS its own representative, so it needs
    # no mapping row.
    membership = (
        docs.select("node", "fp")
        .join(multi, "fp", "left")
        .select(
            "node",
            F.coalesce("rep", "node").alias("rep"),
            F.coalesce("n_fp", F.lit(1)).alias("n_fp"),
        )
    )
    labels = (
        membership.join(cc, "rep", "left")
        .filter(F.col("cc_cluster").isNotNull() | (F.col("n_fp") >= 2))
        .select("node", F.coalesce("cc_cluster", "rep").alias("cluster"))
    )
    if with_bucket_stats:
        return labels, stats
    return labels


def dedup_clusters(
    df: DataFrame, id_col: str, text_col: str, rebalance: bool = True
) -> DataFrame:
    """Near-dup clusters over MinHash-LSH pairs: one row per cluster
    with its representative (min id), member count, and sorted member
    list — the keep-one-representative contract of a dedup pass.
    Exact-dedup-first via dedup_resolution (see its docstring)."""
    cc = dedup_resolution(df, id_col, text_col, rebalance=rebalance)
    return (
        cc.groupBy("cluster")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(F.array_sort(F.collect_list(F.col("node").cast("string"))), ",").alias("members"),
        )
    )


def _sql_dedup_labels(table: str, id_col: str, text_col: str) -> str:
    """Shared oracle CTE body: transitive closure of the FULL-corpus
    pair graph UNION exact-fingerprint edges, then min reachable id per
    node.  Exponentially dumber than the Spark exact-dedup-first +
    label-propagation path — which is the point: an independent
    derivation that proves the rep-first optimization preserves the
    full-graph semantics (identical docs have identical signatures, so
    the components coincide)."""
    pairs = sql_minhash_lsh_pairs(table, id_col, text_col, cap_unit="fingerprints")
    return f"""pairs AS ({pairs}),
    fp_groups AS (
      SELECT {id_col} AS node,
             min({id_col}) OVER (PARTITION BY md5({text_col})) AS rep,
             count(*) OVER (PARTITION BY md5({text_col})) AS n_fp
      FROM {table}
    ),
    edges AS (
      SELECT doc1 AS src, doc2 AS dst FROM pairs
      UNION
      SELECT doc2, doc1 FROM pairs
      UNION
      SELECT node, rep FROM fp_groups WHERE n_fp >= 2
      UNION
      SELECT rep, node FROM fp_groups WHERE n_fp >= 2
    ),
    reach(node, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS (SELECT node, min(root) AS cluster FROM reach GROUP BY node)"""


def sql_dedup_clusters(table: str, id_col: str, text_col: str) -> str:
    return f"""
    WITH RECURSIVE {_sql_dedup_labels(table, id_col, text_col)}
    SELECT cluster, count(*) AS n_docs,
           string_agg(CAST(node AS VARCHAR), ',' ORDER BY CAST(node AS VARCHAR)) AS members
    FROM labels GROUP BY cluster
    """


def _simhash_batch(texts) -> list[int]:
    """Vectorized SimHash core (numpy), bit-identical to sql_simhash:
    features are k-word shingles (multiplicity-weighted), feature hash
    is the FULL 60-bit md5 prefix — NOT reduced mod P.  (The mod-P
    reduction minhash needs would zero bits 31-59 and collapse the top
    two LSH bands to constants, degenerating banding to all-pairs —
    measured on the sf0.01 corpus in round 1.)  Docs with < k words get
    a NULL signature — out-of-band, unlike 0, which a real ≥k-word
    document whose 60 vote sums are all ≤ 0 can legitimately produce
    (probability ~2⁻⁶⁰ on natural text, but the sentinel must not
    collide at all)."""
    import numpy as np

    J = np.arange(SIMHASH_BITS, dtype=np.int64)
    out = []
    for t in texts:
        words = [w for w in (t or "").split(" ") if w]
        if len(words) < SHINGLE_K:
            out.append(None)
            continue
        counts: dict[str, int] = {}
        for i in range(len(words) - SHINGLE_K + 1):
            s = " ".join(words[i : i + SHINGLE_K])
            counts[s] = counts.get(s, 0) + 1
        hs = np.fromiter((_md5_60(s) for s in counts), dtype=np.int64, count=len(counts))
        cnt = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        bits = (hs[None, :] >> J[:, None]) & 1
        votes = ((bits * 2 - 1) * cnt[None, :]).sum(axis=1)
        out.append(int(((votes > 0).astype(np.int64) << J).sum()))
    return out


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(_simhash_batch(texts))


def simhash(
    df: DataFrame, id_col: str, text_col: str, rebalance: bool = True
) -> DataFrame:
    """60-bit multiplicity-weighted shingle SimHash per document.

    One Arrow-batched numpy pass — a narrow map, no shuffle at all.
    The equivalent relational form (explode shingles × explode 60 bit
    positions → two wide aggregations) shuffles 60×|corpus shingles|
    rows and was retired from the execution path in round 2; it
    survives verbatim as the DuckDB oracle (sql_simhash), which checks
    this implementation bit-for-bit."""
    # same caller-declared rebalance flag as minhash_signatures (round-6)
    base = df.select(F.col(id_col), F.col(text_col))
    if rebalance:
        base = base.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return base.select(F.col(id_col), _simhash_udf(F.col(text_col)).alias("simhash"))


# ---------------------------------------------------------------------------
# Oracle SQL builders (DuckDB) — generated from the SAME constants
# ---------------------------------------------------------------------------

def _sql_words(text: str) -> str:
    return f"list_filter(string_split({text}, ' '), x -> x <> '')"


def _sql_shingles(text: str, k: int = SHINGLE_K) -> str:
    w = _sql_words(text)
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return (
        f"(SELECT CASE WHEN len(w) >= {k} THEN "
        f"list_transform(range(1, len(w) - {k} + 2), i -> {parts}) "
        f"ELSE [] END FROM (SELECT {w} AS w))"
    )


def sql_token_hash(expr: str) -> str:
    return f"(CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {MINHASH_P})"


def sql_exact_duplicates(table: str, id_col: str, text_col: str) -> str:
    return f"""
    SELECT md5({text_col}) AS fp, count(*) AS n_docs, min({id_col}) AS representative
    FROM {table} GROUP BY 1
    """


def sql_minhash_lsh_pairs(
    table: str,
    id_col: str,
    text_col: str,
    bucket_cap: int = LSH_BUCKET_CAP,
    cap_unit: str = "docs",
) -> str:
    """Oracle for minhash_lsh_pairs, INCLUDING the bucket cap — both
    engines drop exactly the same oversized buckets, so the
    differential holds on duplicate-flood inputs.

    cap_unit:
      "docs"         — bucket size = raw member count.  Mirrors calling
                       minhash_lsh_pairs directly on a corpus (the
                       standalone registry query).
      "fingerprints" — bucket size = count of DISTINCT md5({text_col})
                       among members.  Mirrors the exact-dedup-first
                       path (dedup_resolution), where Spark's buckets
                       hold one representative per fingerprint: a
                       byte-identical flood inflates raw member counts
                       but not rep counts, and the cap must see what
                       Spark's buckets see."""
    perm_rows = ", ".join(f"({i}, {PERM_A[i]}, {PERM_B[i]})" for i in range(N_PERM))
    if cap_unit == "docs":
        bsz = "SELECT bucket, count(*) AS n FROM buckets GROUP BY bucket"
    elif cap_unit == "fingerprints":
        bsz = f"""SELECT b.bucket, count(DISTINCT md5(t.{text_col})) AS n
      FROM buckets b JOIN {table} t ON t.{id_col} = b.doc GROUP BY b.bucket"""
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown cap_unit {cap_unit!r}")
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc, unnest(list_distinct({_sql_shingles(text_col)})) AS shingle
      FROM {table}
    ),
    hashed AS (SELECT doc, {sql_token_hash('shingle')} AS h FROM sh),
    perms(perm_id, a, b) AS (VALUES {perm_rows}),
    sig AS (
      SELECT doc, perm_id, min((a * h + b) % {MINHASH_P}) AS minval
      FROM hashed CROSS JOIN perms GROUP BY doc, perm_id
    ),
    banded AS (
      SELECT doc, CAST(perm_id // {LSH_ROWS} AS INT) AS band, perm_id, minval FROM sig
    ),
    buckets AS (
      SELECT doc,
             (CAST(band AS VARCHAR) || ':' ||
              string_agg(CAST(minval AS VARCHAR), ',' ORDER BY perm_id)) AS bucket
      FROM banded GROUP BY doc, band
    ),
    bsz AS ({bsz}),
    -- LEFT side of each pair: every member for within-cap buckets,
    -- only the bucket minimum for over-cap buckets ([min] x members =
    -- the star rule; mirrors minhash_lsh_pairs exactly)
    lefts AS (
      SELECT b.doc, b.bucket FROM buckets b JOIN bsz USING (bucket)
      WHERE n <= {bucket_cap}
      UNION ALL
      SELECT min(b.doc) AS doc, b.bucket
      FROM buckets b JOIN bsz USING (bucket)
      WHERE n > {bucket_cap}
      GROUP BY b.bucket
    ),
    pairs AS (
      SELECT a.doc AS doc1, b.doc AS doc2, count(*) AS n_shared_bands
      FROM lefts a JOIN buckets b USING (bucket)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc1, doc2, n_shared_bands FROM pairs
    """


def sql_ngram_jaccard_pairs(table: str, id_col: str, text_col: str, top_n: int = 20) -> str:
    return f"""
    WITH raw AS (
      SELECT {id_col} AS doc, unnest(list_distinct({_sql_shingles(text_col)})) AS shingle
      FROM {table}
    ),
    sh AS (
      SELECT doc, shingle FROM raw
      QUALIFY count(*) OVER (PARTITION BY shingle) <= {NGRAM_DF_CAP}
    ),
    sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc1, b.doc AS doc2, count(*) AS inter
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc < b.doc GROUP BY 1, 2
    )
    SELECT doc1, doc2, round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc = doc1
    JOIN sizes s2 ON s2.doc = doc2
    ORDER BY CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) DESC, doc1, doc2
    LIMIT {top_n}
    """


def sql_token_hash60(expr: str) -> str:
    """Full 60-bit md5 prefix — the simhash feature hash (no mod-P)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_simhash(table: str, id_col: str, text_col: str) -> str:
    # CAST(sum(...) AS BIGINT): DuckDB sums BIGINT into HUGEINT, which
    # reaches the comparison frame as float64 and hash-mismatches the
    # Spark bigint (round-1 verdict bug #1).
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc, unnest({_sql_shingles(text_col)}) AS s FROM {table}
    ),
    hashed AS (SELECT doc, {sql_token_hash60('s')} AS h FROM sh),
    bits AS (
      SELECT doc, h, j FROM hashed
      CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS j)
    ),
    votes AS (
      SELECT doc, j, sum(((h >> j) & 1) * 2 - 1) AS v
      FROM bits GROUP BY doc, j
    ),
    sig AS (
      SELECT doc, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc
    )
    SELECT t.{id_col} AS doc, sig.simhash AS simhash
    FROM {table} t LEFT JOIN sig ON sig.doc = t.{id_col}
    """


# Banding sized to the pigeonhole guarantee: <= HAMMING_MAX differing
# bits spread over SIMHASH_BANDS disjoint bands leave >= 1 band
# untouched, so every pair within the threshold shares a band bucket —
# candidate recall is EXACT, not probabilistic.  (Round 1 shipped
# HAMMING_MAX=22 with 4 bands, whose guarantee only covers distance 3;
# on the test corpus every C(n,2) pair passed 22 — quadratic output.)
#
# Parameter tradeoff: one mutated word in a ~150-word page flips 0-10
# of the 60 bits (measured on the planted companion pages), so the
# threshold is set to 5 — which forces 6 bands of 10 bits.  Band width
# must stay >= log2(corpus/bands) for buckets to stay sparse: 10-bit
# chunks are sparse up to ~10^4 docs per partition of the corpus; for
# web scale either widen the signature (e.g. 96-bit, 6x16) or prefer
# minhash-LSH, whose bucket keys don't saturate.
HAMMING_MAX = 5
SIMHASH_BAND_BITS = 10
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS  # 6
assert HAMMING_MAX < SIMHASH_BANDS


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_cap: int = LSH_BUCKET_CAP,
    rebalance: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding: candidates share one
    SIMHASH_BAND_BITS-bit chunk (6 bands × 10 bits — equi-join, never
    a cross join), then exact Hamming distance via bit_count(xor).
    Canonical doc1 < doc2.

    Recall contract: exact for hamming <= HAMMING_MAX (= SIMHASH_BANDS-1,
    pigeonhole over disjoint bands) — among pairs whose buckets stay
    within `bucket_cap`.  Like minhash_lsh_pairs, chunk buckets larger
    than the cap (duplicate floods sharing a band value) degrade to
    STAR candidates — only (bucket-min, member) pairs are generated,
    then Hamming-verified like any candidate — so output stays linear
    in bucket size and a near-identical flood (pairwise distances ~0)
    still surfaces its min-rooted edges instead of vanishing (round 3
    dropped such buckets outright).  Unlike the minhash star, cluster
    recall is not guaranteed 1.0: a member > HAMMING_MAX from the
    bucket minimum loses its star edge even if within range of some
    other member — the price of keeping the verified-distance
    contract.  Measured (test_simhash_cap_recall_measured, 60-doc
    drift chain, 19-member bucket under cap=10): pair recall 13/14 ≈
    0.93, cluster co-membership recall 1.0 — the lost pairs' endpoints
    stayed connected through surviving chain edges; on a topology
    whose ONLY links route through a far-from-min member, cluster
    recall degrades too.  The oracle applies the identical cap and
    star rule."""
    sig = simhash(df, id_col, text_col, rebalance=rebalance).select(
        F.col(id_col).alias("doc"), F.col("simhash")
    )
    # NULL signature = "no shingles" (out-of-band: a computable 0 is a
    # legitimate, if ~2^-60-rare, signature); pairing sentinel docs is
    # meaningless — and they would all share one bucket per band,
    # turning it into a corpus-sized collect_list.  The exclusion
    # lives INSIDE the generator expression (explode(NULL) emits no
    # rows): a plain filter on the UDF column would be pushed below
    # the repartition and duplicate the whole Arrow pass (plan-shape
    # test gates this).
    band_array = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.expr(f"(shiftright(simhash, {j * SIMHASH_BAND_BITS}) & {2**SIMHASH_BAND_BITS - 1})").alias("chunk"),
        )
        for j in range(SIMHASH_BANDS)
    ])
    chunks = sig.select(
        "doc",
        "simhash",
        F.explode(F.when(F.col("simhash").isNotNull(), band_array)).alias("bc"),
    ).select("doc", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    # within-bucket pairs via one aggregation + double explode — a
    # bucket self-join would re-run the signature UDF subtree twice
    # (see minhash_lsh_pairs for the rationale and reference citation)
    grouped = (
        chunks.groupBy("band", "chunk")
        .agg(F.collect_list(F.struct("doc", "simhash")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    # LEFT side: every member within cap, only the bucket minimum
    # above it ([min] × members = the star rule; min struct = min doc
    # since doc leads the struct and is unique)
    return (
        grouped.select(
            F.explode(
                F.when(F.size("ms") <= bucket_cap, F.col("ms")).otherwise(
                    F.array(F.array_min("ms"))
                )
            ).alias("a"),
            F.col("ms"),
        )
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc1"),
            F.col("b.doc").alias("doc2"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


def sql_simhash_near_pairs(
    table: str, id_col: str, text_col: str, bucket_cap: int = LSH_BUCKET_CAP
) -> str:
    sim = sql_simhash(table, id_col, text_col)
    return f"""
    WITH sig AS ({sim}),
    chunks AS (
      SELECT doc, simhash, j AS band,
             (simhash >> (j * {SIMHASH_BAND_BITS})) & {2**SIMHASH_BAND_BITS - 1} AS chunk
      FROM sig CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BANDS})) AS j)
      WHERE simhash IS NOT NULL
    ),
    bsz AS (
      SELECT band, chunk, count(*) AS n FROM chunks GROUP BY band, chunk
    ),
    -- star rule mirror: every member for within-cap buckets, only the
    -- bucket-minimum row above the cap
    lefts AS (
      SELECT c.doc, c.simhash, c.band, c.chunk
      FROM chunks c JOIN bsz USING (band, chunk) WHERE n <= {bucket_cap}
      UNION ALL
      SELECT arg_min(c.doc, c.doc) AS doc, arg_min(c.simhash, c.doc) AS simhash,
             c.band, c.chunk
      FROM chunks c JOIN bsz USING (band, chunk) WHERE n > {bucket_cap}
      GROUP BY c.band, c.chunk
    )
    SELECT DISTINCT a.doc AS doc1, b.doc AS doc2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM lefts a JOIN chunks b USING (band, chunk)
    WHERE a.doc < b.doc AND bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """
