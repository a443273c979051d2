"""Physical-plan quality gates (the 100 TB checklist, SURVEY.md §4).

These tests pin the plan shapes that matter at scale:
  * the extraction scan reads ONLY the 5 input columns (column pruning);
  * no Exchange (shuffle) of raw payloads before the extraction kernel;
  * small dims broadcast in the join chain;
  * filters are pushed into the parquet scan;
  * the chunk operator needs no window Exchange (posexplode ordinals).
Plans regress silently; grepping .explain output is how we notice.
"""

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    from pdf_to_text_spark.sources.pages import write_pages

    path = str(tmp_path_factory.mktemp("plans") / "pages")
    write_pages(spark, 100, path, num_partitions=2)
    return spark.read.parquet(path)


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_extraction_scan_prunes_columns(pages):
    from pdf_to_text_spark.operators.extraction import run_extraction

    plan = _plan(run_extraction(pages.withColumn("extra", F.lit(1))))
    m = re.search(r"ReadSchema: (.+)", plan)
    assert m, plan
    read = m.group(1)
    assert "extra" not in read
    for col in ("url", "warc_ts", "html", "text", "lang"):
        assert col in read


def _exchange_inputs(plan: str) -> list[str]:
    """The `Input [..]: [...]` column list of every Exchange node in a
    formatted plan (includes BroadcastExchange)."""
    return re.findall(r"\) \w*Exchange\w*[^\n]*\nInput \[\d+\]: \[([^\]]*)\]", plan)


def test_no_payload_shuffle_before_kernel(pages):
    """The 100 TB invariant, both dedup strategies: NO Exchange ever
    carries payload bytes. On the default (auto→prefilter) path not even
    extracted text crosses a shuffle — the only exchange is the broadcast
    of the collected dup-url relation."""
    from pdf_to_text_spark.operators.extraction import run_extraction

    plan = _plan(run_extraction(pages))  # auto → prefilter on this corpus
    assert "MapInPandas" in plan
    inputs = _exchange_inputs(plan)
    for cols in inputs:
        assert "html" not in cols and "extracted_text" not in cols, plan
    # prefilter: the ONLY exchange is the broadcast of the tiny dup set
    assert all("Broadcast" in m for m in re.findall(r"\) (\w*Exchange\w*)", plan)), plan

    # window strategy: kernel straight off the scan, the one shuffle is
    # AFTER the kernel and carries derived rows only (kilobytes, not MB)
    plan_w = _plan(run_extraction(pages, dedup_strategy="window"))
    kernel_pos = plan_w.find("MapInPandas")
    scan_to_kernel = plan_w[plan_w.find("Scan parquet") : kernel_pos]
    assert "Exchange" not in scan_to_kernel
    for cols in _exchange_inputs(plan_w):
        assert "html" not in cols, plan_w


def test_salted_path_shuffles_by_bucket_and_salt(pages):
    from pdf_to_text_spark.operators.extraction import run_extraction

    plan = _plan(run_extraction(pages, shuffle_payloads=True, num_partitions=8))
    assert "hashpartitioning" in plan and "xxhash64" in plan


def test_broadcast_join_for_small_dims(spark):
    from pdf_to_text_spark.operators.relational import top_nation_revenue
    from pdf_to_text_spark.sources.catalog import load

    sf = "/root/testdata/sf0.001"
    plan = _plan(
        top_nation_revenue(
            load(spark, "orders", sf), load(spark, "customer", sf), load(spark, "nation", sf)
        )
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # both dims broadcast


def test_filter_pushdown_reaches_scan(spark):
    from pdf_to_text_spark.sources.catalog import load

    sf = "/root/testdata/sf0.001"
    df = load(spark, "orders", sf).where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey")
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*o_orderpriority.*\]", plan), plan
    m = re.search(r"ReadSchema: (.+)", plan)
    assert "o_totalprice" not in m.group(1)  # pruned


def test_chunk_assembly_single_aggregate_no_window(spark):
    """chunks_df must be explode → project → ONE hash aggregate pair —
    no Window operator (the ordinal comes from posexplode for free)."""
    import datetime as dt

    from pdf_to_text_spark.operators.extraction import run_extraction
    from pdf_to_text_spark.operators.records import blocks_df, chunks_df, with_chunk_id
    from pdf_to_text_spark.sources.pages import PAGES_SCHEMA

    df = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), b"%PDF-x", None, "en")], schema=PAGES_SCHEMA
    )
    plan = _plan(chunks_df(with_chunk_id(blocks_df(run_extraction(df, dedup=False)))))
    assert "Window" not in plan
    assert "Generate posexplode" in plan or "posexplode" in plan


def test_lsh_band_join_is_hash_keyed_not_cartesian(spark):
    """MinHash/SimHash candidate joins must hash-join on band keys —
    a cartesian/BNLJ here is corpus² and would be fatal at scale."""
    from pdf_to_text_spark.operators import dedup
    from pdf_to_text_spark.sources.catalog import load

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    for df in (
        dedup.minhash_candidate_pairs(dedup.minhash_signatures(docs)),
        dedup.simhash_near_pairs(docs),
        dedup.ngram_jaccard_pairs(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_pairs_lsh_is_bucket_keyed(spark):
    """The queries() entry point for embedding near-dup must be the
    LSH-bucketed plan (VERDICT r1 #3): keyed joins only — the O(n²)
    cross join lives solely in embedding_near_pairs_exact."""
    from pdf_to_text_spark.operators import dedup
    from pdf_to_text_spark.sources.catalog import load

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    plan = _plan(dedup.embedding_near_pairs(emb, threshold=0.3, dim=64))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the audit baseline is deliberately exhaustive
    exact = _plan(dedup.embedding_near_pairs_exact(emb, threshold=0.3))
    assert "CartesianProduct" in exact or "BroadcastNestedLoopJoin" in exact


def test_ngram_jaccard_candidates_path_is_keyed(spark):
    """ngram_jaccard_pairs(candidates=...) — the 100 TB LSH-then-verify
    composition — must stay equi-join-keyed, never all-pairs."""
    from pdf_to_text_spark.operators import dedup
    from pdf_to_text_spark.sources.catalog import load

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    cand = dedup.minhash_candidate_pairs(dedup.minhash_signatures(docs))
    plan = _plan(dedup.ngram_jaccard_pairs(docs, threshold=0.5, candidates=cand))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_relational_agg_plan_shape(spark):
    """Q1 shape: filter pushed to parquet, map-side partial aggregation,
    shuffle carries only the grouped partials (AQE wraps codegen, so we
    assert the load-bearing plan features rather than the codegen label)."""
    from pdf_to_text_spark.operators.relational import pricing_summary
    from pdf_to_text_spark.sources.catalog import load

    plan = _plan(pricing_summary(load(spark, "lineitem", "/root/testdata/sf0.001")))
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan)
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert plan.index("partial_sum") < plan.index("hashpartitioning")


def test_spread_small_scan_is_adaptive(spark, monkeypatch, tmp_path):
    """spread_small_scan (r7): repartitions ONLY mid-size relations with
    KNOWN size — tiny inputs keep their plan (scheduling-bound, r6
    measurement), huge inputs keep theirs (the scan is already parallel;
    re-shuffling would be a payload shuffle), and unknown-stats plans
    (LogicalRDD reports Long.MaxValue) are never touched. The decision
    is driven by optimizer stats, steered here via config thresholds."""
    import pdf_to_text_spark.config as cfg
    from pdf_to_text_spark.plans.layout import spread_small_scan

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "word " * 50) for i in range(200)], "doc_id long, text string"
    ).coalesce(1).write.parquet(path)
    docs = spark.read.parquet(path)

    def n_shuffles(df):
        return _plan(df).count("Exchange")

    # default thresholds: this file is tiny -> untouched
    assert n_shuffles(spread_small_scan(docs)) == 0
    # lower MIN below the relation size -> spread fires (the formatted
    # plan names each node twice — tree + details — so assert presence)
    monkeypatch.setattr(cfg, "SPREAD_MIN_BYTES", 1)
    assert n_shuffles(spread_small_scan(docs)) >= 1
    # MAX below the relation size -> "already parallel at scale" no-op
    monkeypatch.setattr(cfg, "SPREAD_MAX_BYTES", 2)
    assert n_shuffles(spread_small_scan(docs)) == 0
    # unknown stats (createDataFrame -> LogicalRDD, MaxValue) -> no-op
    monkeypatch.setattr(cfg, "SPREAD_MAX_BYTES", 1 << 62)
    local = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    assert n_shuffles(spread_small_scan(local)) == 0


def test_band_persist_is_stats_gated(spark, monkeypatch, tmp_path):
    """dedup._persist_if_large (r7): persists a fan-out relation only
    above the BAND_PERSIST_MIN_BYTES estimate — the cache barrier costs
    more than the recompute on tiny corpora (measured at 5k docs)."""
    import pdf_to_text_spark.config as cfg
    from pdf_to_text_spark.operators.dedup import _persist_if_large

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "text " * 20) for i in range(100)], "doc_id long, text string"
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert not _persist_if_large(df).storageLevel.useMemory  # tiny -> no
    monkeypatch.setattr(cfg, "BAND_PERSIST_MIN_BYTES", 1)
    out = _persist_if_large(df)
    assert out.storageLevel.useMemory  # above gate -> persisted
    out.unpersist()


def test_spread_small_scan_preserves_results(spark, monkeypatch, tmp_path):
    """Operators that adopted spread_small_scan must return identical
    rows with the spread forced on vs off (the r7 A/B identity gate,
    run at sf1.0 across all 21 touched operators; pinned here at test
    scale on a representative JVM path and a kernel path)."""
    import pdf_to_text_spark.config as cfg
    from pdf_to_text_spark.operators.dedup import minhash_dedup_pairs
    from pdf_to_text_spark.operators.text_analysis import text_profile

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 7} common tail words here") for i in range(300)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(path)
    docs = spark.read.parquet(path)
    for fn in (text_profile, lambda d: minhash_dedup_pairs(d, threshold=0.2)):
        monkeypatch.setattr(cfg, "SPREAD_MIN_BYTES", 1 << 60)
        off = sorted(map(tuple, fn(docs).collect()))
        monkeypatch.setattr(cfg, "SPREAD_MIN_BYTES", 1)
        spark.catalog.clearCache()
        on = sorted(map(tuple, fn(docs).collect()))
        assert on == off


def test_merged_profile_queries_stay_single_pass(spark):
    """The round-3 merged driver queries must keep the one-pass shapes
    they were merged FOR: corpus_stats = one scan + one keyed Exchange
    (the groupBy), quality_stats(+score) = map-only, zero Exchange."""
    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [(1, "some text here", "en", "s0", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from pdf_to_text_spark.operators.sketches import corpus_stats
    from pdf_to_text_spark.operators.text_analysis import quality_profile

    cs = corpus_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert cs.count("Exchange") == 1 and "Join" not in cs
    qp = quality_profile(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in qp and "Join" not in qp
