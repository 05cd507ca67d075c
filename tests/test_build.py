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
    # two row families: NN_* doc counts (monotone) and 6N_lsh_* audit
    # gauges (bucket statistics, NOT doc counts — excluded from the
    # monotone contract)
    stages = sorted(k for k in lineage if not k.startswith("6"))
    # monotone: every stage only removes documents
    for a, b in zip(stages, stages[1:]):
        if b == "50_written":
            continue
        assert lineage[a] >= lineage[b], (a, b, lineage)
    assert lineage["10_quality_kept"] > 0
    # written = post-budget survivors, exactly
    assert lineage["50_written"] == lineage["40_after_budget"] > 0
    # the LSH occupancy audit always records its two gauges (zero on a
    # corpus with no over-cap buckets)
    assert lineage["60_lsh_over_cap_buckets"] >= 0
    assert lineage["61_lsh_max_bucket_size"] >= 0

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


def test_build_lsh_audit_populates_on_planted_flood(spark, pages_path, tmp_path):
    """A near-but-not-exact duplicate flood bigger than the bucket cap
    must surface in the build lineage as over-cap bucket gauges — the
    observability contract for the star-edge degradation path.

    Flood construction: 40 SINGLE-LINE docs share one ~120-word stream
    (so they co-bucket in LSH bands — minhash tokenizes on literal
    spaces, and a newline would glue its neighbors into one token) with
    a unique tail word each — no two docs share a literal line (each
    doc IS one unique line, so strip_boilerplate's df cap never fires)
    and no two share an md5 fingerprint (survives exact-dedup collapse,
    so the flood genuinely reaches the LSH stage)."""
    import random

    import pandas as pd

    rng = random.Random(7)
    from wtq.rules.lexicon import CONTENT_WORDS, LANG_WORDS

    words = [
        rng.choice(LANG_WORDS["en"]) if rng.random() < 0.45 else rng.choice(CONTENT_WORDS)
        for _ in range(120)
    ]
    rows = []
    base_ts = pd.Timestamp("2025-01-01")
    for i in range(40):
        text = " ".join(words + [f"tail{i}"])  # one unique line per doc
        rows.append(
            (
                f"https://flood.example.com/doc/{i}",
                base_ts,
                b"<html><body>" + text.encode() + b"</body></html>",
                text,
                "en",
            )
        )
    flood = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    fixture = pd.read_parquet(pages_path)
    src = str(tmp_path / "pages_flood.parquet")
    merged = pd.concat([fixture, flood], ignore_index=True)
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    merged["warc_ts"] = merged["warc_ts"].astype("datetime64[us]")
    merged.to_parquet(src, index=False)

    out = str(tmp_path / "corpus")
    res = build_training_set(
        spark, src, out, num_partitions=8, lsh_bucket_cap=10
    )
    lineage = {r.stage: r.n_docs for r in res.lineage.collect()}
    assert lineage["60_lsh_over_cap_buckets"] >= 1, lineage
    assert lineage["61_lsh_max_bucket_size"] > 10, lineage
    # the flood still resolves to ONE cluster representative in the
    # output (star edges keep the bucket connected): at most one
    # flood url survives into the written corpus
    written = spark.read.parquet(out)
    n_flood = written.filter(F.col("url").startswith("https://flood.")).count()
    assert n_flood <= 1, n_flood


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


def test_build_classifier_gate_drops_negative_family(spark, pages_path, tmp_path):
    """Model-based gate (classifier_seed): two planted families of
    rule-passing pages with disjoint content vocabulary; a seed labeled
    P-positive / N-negative must keep family P and drop family N — and
    the SAME corpus built WITHOUT the seed must keep both, proving the
    drop is the classifier's and not the rule battery's."""
    import random

    import pandas as pd

    from wtq.rules.lexicon import CONTENT_WORDS, LANG_WORDS

    rng = random.Random(11)
    half = len(CONTENT_WORDS) // 2
    vocab_p, vocab_n = CONTENT_WORDS[:half], CONTENT_WORDS[half:]

    def page_text(vocab, seed_words=120):
        # 45% English stopword-ish words keep the rule battery green
        # (same recipe as the flood test); content words come from ONE
        # family's vocabulary so the NB scorer can separate them
        return " ".join(
            rng.choice(LANG_WORDS["en"]) if rng.random() < 0.45 else rng.choice(vocab)
            for _ in range(seed_words)
        )

    rows = []
    base_ts = pd.Timestamp("2025-01-01")
    for fam, vocab in (("pfam", vocab_p), ("nfam", vocab_n)):
        for i in range(4):
            text = page_text(vocab)
            rows.append(
                (
                    f"https://{fam}.example.com/doc/{i}",
                    base_ts,
                    b"<html><body>" + text.encode() + b"</body></html>",
                    text,
                    "en",
                )
            )
    planted = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    fixture = pd.read_parquet(pages_path)
    merged = pd.concat([fixture, planted], ignore_index=True)
    merged["warc_ts"] = merged["warc_ts"].astype("datetime64[us]")
    src = str(tmp_path / "pages_fams.parquet")
    merged.to_parquet(src, index=False)

    seed = spark.createDataFrame(
        [(page_text(vocab_p), True) for _ in range(6)]
        + [(page_text(vocab_n), False) for _ in range(6)],
        "text string, y boolean",
    )

    out_b = str(tmp_path / "corpus_nogate")
    base = build_training_set(spark, src, out_b, num_partitions=8, lsh_audit=False)
    base_written = spark.read.parquet(out_b)
    assert base_written.filter(F.col("url").contains("nfam")).count() > 0
    assert base_written.filter(F.col("url").contains("pfam")).count() > 0
    assert "15_classifier_kept" not in {r.stage for r in base.lineage.collect()}

    out_g = str(tmp_path / "corpus_gated")
    gated = build_training_set(
        spark, src, out_g, num_partitions=8, lsh_audit=False, classifier_seed=seed
    )
    lineage = {r.stage: r.n_docs for r in gated.lineage.collect()}
    assert (
        lineage["10_quality_kept"]
        > lineage["15_classifier_kept"]
        >= lineage["20_after_dedup"]
    ), lineage
    written = spark.read.parquet(out_g)
    assert written.filter(F.col("url").contains("nfam")).count() == 0
    assert written.filter(F.col("url").contains("pfam")).count() > 0
