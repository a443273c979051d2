"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship boilerplate-strip round-trip on sf0.001;
`queries()` exposes every implemented operator from SURVEY.md §2 (+ the
training-data ops) over the driver tables; `oracle_sql()` gives the
DuckDB-equivalent SQL where the operator is SQL-expressible (extraction
kernels, MinHash/SimHash/LSH signatures, winnowing and media decode are
not — those get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the engine importable on this session's Python workers.

    The driver builds its own SparkSession; ship engine.zip to it once
    (same mechanism as spark-submit --py-files). Safe to call repeatedly.
    Delegates to config.ensure_shipped — ONE applicationId-keyed
    registry shared with build_spark (r6 review: two independent
    registries shipped two independently zipped copies of engine.zip to
    the same app, re-risking the 'file exists and does not match
    contents' executor-fetch failure the guard exists to prevent).
    Failures are swallowed here (retried on the next call; local
    sys.path may suffice), and the shared registry marks shipped only
    on SUCCESS (r3 review)."""
    try:
        from pdf_to_text_spark.config import ensure_shipped

        ensure_shipped(spark)
    except Exception:
        pass


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap sf0.001 corpus text in boilerplate HTML, run the
    extraction pipeline, return (doc_id, extracted_text) — must equal the
    original text per doc (byte-identical main-content extraction)."""
    from pdf_to_text_spark.operators.extraction import html_roundtrip_extract

    return html_roundtrip_extract(_docs(spark, "/root/testdata/sf0.001"))


# ── queries ──────────────────────────────────────────────────────────────────


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_to_text_spark.operators import (
        dedup,
        extraction,
        multimodal,
        relational,
        similarity,
        text_analysis,
    )

    def q_extract_html_roundtrip(spark, sf):
        return extraction.html_roundtrip_extract(_docs(spark, sf))

    def q_extraction_pdf_e2e(spark, sf):
        """Round 4: the 120-row corpus arrives THROUGH the WARC ingestion
        walker (synthetic_warc_pages), so sources/warc.py sits inside
        this CORRECTNESS-checked path (VERDICT r3 #5) — same rows, same
        replay oracle."""
        _ensure_shipped(spark)
        from pdf_to_text_spark.sources.warc import synthetic_warc_pages

        # dedup_strategy="window": over the mapInPandas WARC source the
        # auto prefilter's eager stats job cannot prune columns past the
        # walker, so it executes the full gunzip+record walk a second
        # time per run (extraction.py's own r6 SCALE CAVEAT); the window
        # strategy gives identical keep-newest semantics in one pass and
        # the corpus's dup urls have distinct whole-second timestamps
        # (r6 review)
        ex = extraction.run_extraction(
            synthetic_warc_pages(spark, 120), dedup_strategy="window"
        )
        return ex.select("url", "content_type", "n_pages", "n_chars", "parse_status")

    def q_pricing_summary(spark, sf):
        return relational.pricing_summary(_t(spark, sf, "lineitem"))

    def q_top_nation_revenue(spark, sf):
        return relational.top_nation_revenue(
            _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation")
        )

    def q_latest_event_per_user(spark, sf):
        return relational.latest_event_per_user(_t(spark, sf, "events"))

    def q_word_chunk_reassembly(spark, sf):
        return relational.word_chunk_reassembly(_docs(spark, sf))

    def q_corpus_rollup(spark, sf):
        return relational.corpus_rollup(_docs(spark, sf))

    def q_doc_embedding_join(spark, sf):
        return relational.doc_embedding_join(_docs(spark, sf), _emb(spark, sf))

    def q_source_dispatch(spark, sf):
        return relational.source_dispatch(_docs(spark, sf))

    def q_lang_source_rollup(spark, sf):
        return relational.lang_source_rollup(_docs(spark, sf))

    def q_lang_pivot(spark, sf):
        return relational.lang_pivot(_docs(spark, sf))

    def q_set_ops(spark, sf):
        return relational.set_ops_demo(_docs(spark, sf))

    def q_corpus_stats(spark, sf):
        # round 3: corpus_sketches ∪ corpus_percentiles, ONE grouped pass
        from pdf_to_text_spark.operators import sketches

        return sketches.corpus_stats(_docs(spark, sf))

    def q_extraction_status_metrics(spark, sf):
        """metrics_rollup's driver-checkable face: status-level rollup of
        the 120-row extraction (docs/pages/chars/failures per status —
        the bucket/task axes are runtime-shaped, status is stable).
        Round 4: input via the WARC walker, like extraction_pdf_e2e."""
        _ensure_shipped(spark)
        from pdf_to_text_spark.sources.warc import synthetic_warc_pages

        # window strategy for the same single-pass reason as
        # q_extraction_pdf_e2e above
        ex = extraction.run_extraction(
            synthetic_warc_pages(spark, 120), dedup_strategy="window"
        )
        return ex.groupBy("parse_status").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("n_pages").cast("long")).alias("pages"),
            F.sum("n_chars").alias("chars"),
            F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
        )

    def q_sessionize_events(spark, sf):
        return relational.sessionize_events(_t(spark, sf, "events"))

    def q_events_asof_last_purchase(spark, sf):
        # as-of join (custom operator): one keyed shuffle, no range join
        return relational.events_asof_last_purchase(_t(spark, sf, "events"))

    def q_events_hourly_rollup(spark, sf):
        return relational.events_hourly_rollup(_t(spark, sf, "events"))

    def q_events_props_rollup(spark, sf):
        return relational.events_props_rollup(_t(spark, sf, "events"))

    def q_high_value_order_lines(spark, sf):
        return relational.high_value_order_lines(
            _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
        )

    def q_quality_stats(spark, sf):
        # round 3: stats + the composite score, one scan (was two queries)
        return text_analysis.quality_profile(_docs(spark, sf))

    def q_language_id(spark, sf):
        return text_analysis.language_id(_docs(spark, sf))

    def q_text_profile(spark, sf):
        return text_analysis.text_profile(_docs(spark, sf))

    def q_redact_pii(spark, sf):
        """PII scrubbing over crafted rows (the corpus carries no PII, so
        the gate exercises real matches) — same regexes both engines.
        r6: 150 generated rows (sources/crafted.py) instead of 4
        hand-listed ones; same edge classes, real volume."""
        from pdf_to_text_spark.sources.crafted import pii_rows

        df = spark.createDataFrame(pii_rows(), "doc_id long, text string")
        return text_analysis.redact_pii(df)

    def q_repetition_stats(spark, sf):
        return text_analysis.repetition_stats(_docs(spark, sf))

    def q_stratified_sample(spark, sf):
        # rebalance: downsample the dominant language, keep the tail dense
        return text_analysis.stratified_sample(
            _docs(spark, sf), "lang",
            {"en": 20, "es": 60, "de": 60, "fr": 60, "zh": 60},
        ).select("doc_id", "lang", "n_chars")

    def q_deterministic_sample(spark, sf):
        # content-addressed 10% subset: rng-free, partition-independent,
        # monotonically nested as pct grows (scaling-law subsets)
        return text_analysis.deterministic_sample(
            _docs(spark, sf), key="doc_id", pct=10
        ).select("doc_id", "lang", "source", "n_chars")

    def q_fingerprints(spark, sf):
        return text_analysis.fingerprints(_docs(spark, sf))

    def q_winnow_fingerprints(spark, sf):
        # arrays crash the driver canonicalizer (pandas can't sort list
        # cells) → collapse the fingerprint array to a deterministic md5 of
        # its JSON form; the VALUES oracle pins the same hash per doc.
        wf = text_analysis.winnow_fingerprints(_docs(spark, sf))
        return wf.select(
            "doc_id",
            "n_grams",
            F.md5(F.to_json("winnow").cast("binary")).alias("winnow_md5"),
        )

    def q_dedup_exact_groups(spark, sf):
        return dedup.dedup_exact_groups(_docs(spark, sf))

    def q_dedup_corpus(spark, sf):
        # the user-facing composition: exact groups → minhash-LSH near-dup
        # pair drop among survivors → per-doc keep flag + reason
        return dedup.dedup_corpus(_docs(spark, sf), near_threshold=0.5)

    def q_strip_duplicate_lines(spark, sf):
        """C4-style global line dedup over crafted multi-line docs (the
        synthetic corpus is single-line and dup-free, so the gate uses
        rows that exercise drops, short-line keeps, and reassembly).
        r6: 120 generated rows (sources/crafted.py) — corpus-hot
        boilerplate, always-kept short lines, docs that empty."""
        from pdf_to_text_spark.sources.crafted import dup_line_rows

        df = spark.createDataFrame(dup_line_rows(), "doc_id long, text string")
        return dedup.strip_duplicate_lines(df, min_words=5)

    def q_strip_duplicate_substrings(spark, sf):
        """ExactSubstr-style k-token duplicate-span removal (Lee et al.
        ACL'22) over crafted docs: cross-doc repeats, intra-doc repeats,
        short docs, and fully-duplicate docs that empty. r6: 120
        generated rows (sources/crafted.py)."""
        from pdf_to_text_spark.sources.crafted import dup_span_rows

        df = spark.createDataFrame(dup_span_rows(), "doc_id long, text string")
        return dedup.strip_duplicate_substrings(df, k=6)

    def q_near_dup_clusters(spark, sf):
        # connected components of the near-dup graph (min-label propagation)
        return dedup.near_dup_clusters(_docs(spark, sf), threshold=0.5)

    def q_ngram_jaccard_pairs(spark, sf):
        return dedup.ngram_jaccard_pairs(_docs(spark, sf), n=3, threshold=0.02)

    def q_minhash_dedup_pairs(spark, sf):
        return dedup.minhash_dedup_pairs(_docs(spark, sf), threshold=0.2)

    def q_simhash_near_pairs(spark, sf):
        # 3 = the pigeonhole completeness bound of the 4x16 banding
        # (Manku WWW'07 operating point); >3 is a loud error in the op
        return dedup.simhash_near_pairs(_docs(spark, sf), max_hamming=3)

    def q_embedding_near_pairs(spark, sf):
        # the 100 TB path: LSH bucket candidates → exact rerank ≥ τ
        # (corpus max pairwise cosine ≈0.51 → τ=0.3 is non-vacuous)
        return dedup.embedding_near_pairs(_emb(spark, sf), threshold=0.3, dim=64)

    def q_embedding_near_pairs_exact(spark, sf):
        # exhaustive O(n²) baseline — audit path, DuckDB-oracle-checked
        return dedup.embedding_near_pairs_exact(_emb(spark, sf), threshold=0.3)

    def q_label_centroids(spark, sf):
        return similarity.label_centroids(_emb(spark, sf))

    def q_knn_brute_force(spark, sf):
        e = _emb(spark, sf)
        return similarity.brute_force_topk(e, similarity.queries_from_corpus(e, 8), k=5)

    def q_knn_lsh(spark, sf):
        e = _emb(spark, sf)
        return similarity.lsh_topk(e, similarity.queries_from_corpus(e, 8), dim=64, k=5)

    def q_knn_ivf(spark, sf):
        # sample_pct=50: the gate exercises the SAMPLED train path (the
        # 100 TB design — k-means never scans the full corpus per iter)
        e = _emb(spark, sf)
        return similarity.ivf_topk(
            e, similarity.queries_from_corpus(e, 8), dim=64, k=5, n_cells=8,
            n_probe=3, sample_pct=50,
        )

    def q_point_lookup(spark, sf):
        """Point-lookup scan (§2 #16, GET /file/:key analogue)."""
        return _docs(spark, sf).where(F.col("doc_id") == 42).select(
            "doc_id", "lang", "source", "n_chars"
        )

    def q_media_features(spark, sf):
        _ensure_shipped(spark)
        feats = multimodal.media_features(multimodal.synth_media_df(spark, 90))
        # feature values are k/1e6 - 1 for integer k (multimodal._decode_stub);
        # recover k exactly and emit the array as JSON text: scalar column for
        # the driver canonicalizer, integer-only so no float-format drift.
        feature_k = F.transform(
            "feature",
            lambda x: F.round((x.cast("double") + 1.0) * 1e6).cast("bigint"),
        )
        return feats.select(
            "media_id",
            "kind",
            "payload_bytes",
            "content_hash",
            F.to_json(feature_k).alias("feature_k"),
            "decode_status",
        )

    def q_image_resize(spark, sf):
        _ensure_shipped(spark)
        return multimodal.image_resize(multimodal.synth_media_df(spark, 90))

    def q_audio_resample(spark, sf):
        """r6: the EXECUTING resample stage (real fixed-point linear DSP
        over decoded WAV-PCM) replaces the metadata-only plan in this
        gate slot; audio_resample_plan keeps its pytest coverage."""
        _ensure_shipped(spark)
        return multimodal.audio_resample(multimodal.synth_media_df(spark, 90))

    def q_llm_record_ingest(spark, sf):
        """r6: 100 generated responses (sources/crafted.py) — fenced/
        unfenced arrays of 1-3 records, empty arrays, invalid JSON, no
        JSON — instead of 3 hand-listed rows."""
        from pdf_to_text_spark.operators.records import records_from_llm_responses
        from pdf_to_text_spark.sources.crafted import llm_response_rows

        df = spark.createDataFrame(
            llm_response_rows(), "url string, chunk_id int, response string"
        )
        return records_from_llm_responses(df)

    def q_streaming_minute_metrics(spark, sf):
        """Structured Streaming path end-to-end: file-source pages stream →
        extraction kernel → watermarked minute rollup, Trigger.AvailableNow
        into a memory sink (VERDICT r1 #9: the streaming modules had tests
        but no driver entry). Minute boundaries emitted as UTC epoch
        seconds so the check is session-timezone-independent."""
        import tempfile

        from pdf_to_text_spark.sources.pages import write_pages
        from pdf_to_text_spark.streaming.extract_stream import (
            crawl_minute_metrics,
            extract_stream,
            read_pages_stream,
        )

        _ensure_shipped(spark)
        tmp = tempfile.mkdtemp(prefix="pts_stream_src_")
        try:
            write_pages(spark, 200, f"{tmp}/pages", num_partitions=4)
            metrics = crawl_minute_metrics(
                extract_stream(read_pages_stream(spark, f"{tmp}/pages"))
            )
            q = (
                metrics.writeStream.format("memory")
                .queryName("pts_minute_metrics")
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .start()
            )
            q.awaitTermination()
        finally:
            # memory-sink rows live in the session, not these files
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        t = spark.table("pts_minute_metrics")
        return t.select(
            F.unix_seconds(F.col("minute_start")).alias("minute_epoch"),
            "lang", "docs", "chars", "parse_failures",
        )

    def q_streaming_dedup_by_url(spark, sf):
        """Stateful streaming dedup (applyInPandasWithState): strictly-newer
        crawls per url across microbatches, availableNow into memory."""
        import tempfile

        from pdf_to_text_spark.sources.pages import write_pages
        from pdf_to_text_spark.streaming.extract_stream import read_pages_stream
        from pdf_to_text_spark.streaming.stateful import dedup_stream_by_url

        _ensure_shipped(spark)
        tmp = tempfile.mkdtemp(prefix="pts_stream_dedup_")
        try:
            write_pages(spark, 200, f"{tmp}/pages", num_partitions=4)
            dedup = dedup_stream_by_url(read_pages_stream(spark, f"{tmp}/pages"))
            q = (
                dedup.writeStream.format("memory")
                .queryName("pts_stream_dedup")
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .start()
            )
            q.awaitTermination()
        finally:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        t = spark.table("pts_stream_dedup")
        return t.select(
            "url",
            F.unix_seconds(F.col("warc_ts")).alias("ts_epoch"),
            "lang",
            "is_first_crawl",
        )

    def q_csv_serialization(spark, sf):
        """CSV quirks (§2 #12) through the JVM path on crafted records."""
        from pdf_to_text_spark.operators.records import csv_documents

        # values stay off round-half boundaries: Java's %.2f rounds the
        # shortest-repr digits half-up while C printf rounds the exact
        # binary expansion — identical except exactly at .xx5 (that edge
        # is pinned by the pytest kernel contract instead). r6: 120
        # generated rows (sources/crafted.py) over 9 documents.
        from pdf_to_text_spark.sources.crafted import csv_record_rows

        df = spark.createDataFrame(
            csv_record_rows(),
            "url string, chunk_id int, block_pos int, record_pos int, "
            "SucursalName string, EAN string, CantidadVendida string, Importe string",
        )
        return csv_documents(df)

    return {
        "extract_html_roundtrip": q_extract_html_roundtrip,
        "extraction_pdf_e2e": q_extraction_pdf_e2e,
        "extraction_status_metrics": q_extraction_status_metrics,
        # streaming queries sit early on purpose: the driver records at
        # most ~50 rows and round 2 lost the then-51st (last) entry
        "streaming_minute_metrics": q_streaming_minute_metrics,
        "streaming_dedup_by_url": q_streaming_dedup_by_url,
        "pricing_summary": q_pricing_summary,
        "top_nation_revenue": q_top_nation_revenue,
        "latest_event_per_user": q_latest_event_per_user,
        "word_chunk_reassembly": q_word_chunk_reassembly,
        "corpus_rollup": q_corpus_rollup,
        "doc_embedding_join": q_doc_embedding_join,
        "source_dispatch": q_source_dispatch,
        "lang_source_rollup": q_lang_source_rollup,
        "lang_pivot": q_lang_pivot,
        "set_ops": q_set_ops,
        "corpus_stats": q_corpus_stats,
        "sessionize_events": q_sessionize_events,
        "events_asof_last_purchase": q_events_asof_last_purchase,
        "events_hourly_rollup": q_events_hourly_rollup,
        "events_props_rollup": q_events_props_rollup,
        "high_value_order_lines": q_high_value_order_lines,
        "strip_duplicate_substrings": q_strip_duplicate_substrings,
        "quality_stats": q_quality_stats,
        "language_id": q_language_id,
        "text_profile": q_text_profile,
        "redact_pii": q_redact_pii,
        "repetition_stats": q_repetition_stats,
        "stratified_sample": q_stratified_sample,
        "deterministic_sample": q_deterministic_sample,
        "fingerprints": q_fingerprints,
        "winnow_fingerprints": q_winnow_fingerprints,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_corpus": q_dedup_corpus,
        "near_dup_clusters": q_near_dup_clusters,
        "strip_duplicate_lines": q_strip_duplicate_lines,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_dedup_pairs": q_minhash_dedup_pairs,
        "simhash_near_pairs": q_simhash_near_pairs,
        "embedding_near_pairs": q_embedding_near_pairs,
        "embedding_near_pairs_exact": q_embedding_near_pairs_exact,
        "label_centroids": q_label_centroids,
        "knn_brute_force": q_knn_brute_force,
        "knn_lsh": q_knn_lsh,
        "media_features": q_media_features,
        "image_resize": q_image_resize,
        "audio_resample": q_audio_resample,
        "knn_ivf": q_knn_ivf,
        "point_lookup": q_point_lookup,
        "llm_record_ingest": q_llm_record_ingest,
        "csv_serialization": q_csv_serialization,
    }


# ── oracle SQL (DuckDB) ──────────────────────────────────────────────────────

_STOPWORDS_SQL = (
    "['the','of','and','to','in','a','is','that','it','for',"
    "'on','with','as','are','was','be','this','have','from','or']"
)

_LANG_PROFILES_SQL = {
    "en": "['the','of','and','to','in','is','that','it','for','was']",
    "es": "['de','la','que','el','en','los','se','las','por','un']",
    "de": "['der','die','und','den','von','zu','das','mit','sich','auf']",
    "fr": "['le','et','les','des','une','dans','est','pour','qui','par']",
}


def _crafted_values(which: str) -> str:
    """VALUES body for the crafted-input queries — SAME generated rows
    the Spark side feeds (sources/crafted.py), rendered for DuckDB; the
    SQL logic on top stays fully independent (r6, VERDICT r5 #4: the
    4-6 hand-listed rows were materially weaker gate evidence)."""
    from pdf_to_text_spark.sources.crafted import (
        csv_record_rows,
        dup_line_rows,
        dup_span_rows,
        llm_response_rows,
        pii_rows,
        render_values,
        render_values_mixed,
    )

    if which in ("csv", "llm"):
        rows_m = csv_record_rows() if which == "csv" else llm_response_rows()
        return render_values_mixed(rows_m)
    rows = {
        "pii": pii_rows,
        "lines": dup_line_rows,
        "spans": dup_span_rows,
    }[which]()
    return render_values(rows)


def oracle_sql(_only: set | None = None) -> dict[str, str]:
    """The driver calls this with no arguments and gets the full dict
    (contract unchanged). `_only` is a local-tooling fast path: the
    VALUES oracles at the bottom each replay a kernel/k-means pass at
    build time, so tools.check_oracle passes the requested query names to
    skip the multi-minute builds it isn't going to compare."""
    from tools import oracle_values as _ov
    from pdf_to_text_spark.operators.text_analysis import PII_PATTERNS as _PII

    # counts mirror the operator's progression: each kind counted on the
    # text AFTER the previous kinds' replacements
    pii_count_exprs = []
    pii_redacted = "text"
    for kind, pat in _PII.items():
        pii_count_exprs.append(
            f"len(regexp_extract_all({pii_redacted}, '{pat}'))::int AS {kind}_hits"
        )
        pii_redacted = (
            f"regexp_replace({pii_redacted}, '{pat}', '<{kind.upper()}>', 'g')"
        )
    pii_counts = ",\n  ".join(pii_count_exprs)

    lang_hits = ",\n  ".join(
        f"len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\f\\r]+'), "
        f"w -> list_contains({prof}, w))) AS {lang}_hits"
        for lang, prof in _LANG_PROFILES_SQL.items()
    )
    # one copy of the argmax-with-und tiebreak: the NULL-text 'und' guard
    # was an r5 bug fix — two inline copies could be "fixed" alone and
    # silently diverge between the language_id and text_profile oracles
    # (r6 review)
    _PRED_LANG_CASE = """CASE WHEN greatest(en_hits, es_hits, de_hits, fr_hits) = 0
                          OR greatest(en_hits, es_hits, de_hits, fr_hits) IS NULL
                        THEN 'und'
                        WHEN en_hits = greatest(en_hits, es_hits, de_hits, fr_hits) THEN 'en'
                        WHEN es_hits = greatest(en_hits, es_hits, de_hits, fr_hits) THEN 'es'
                        WHEN de_hits = greatest(en_hits, es_hits, de_hits, fr_hits) THEN 'de'
                        ELSE 'fr' END AS pred_lang"""
    out = {
        "extract_html_roundtrip": (
            "SELECT doc_id, text AS extracted_text FROM documents"
        ),
        # decimal sums in BOTH engines: double sums are partition-order
        # dependent, so a 2dp round near a .005 boundary could flip vs the
        # oracle (both engines round decimal half-away-from-zero)
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   cast(round(sum(cast(l_quantity as decimal(18,6))), 2) as double) AS sum_qty,
                   cast(round(sum(cast(l_extendedprice as decimal(18,6))), 2) as double) AS sum_base_price,
                   cast(round(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))), 2) as double) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_nation_revenue": """
            SELECT n_name,
                   cast(round(sum(cast(o_totalprice as decimal(18,6))), 2) as double) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY revenue DESC
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, event_type, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "word_chunk_reassembly": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            idx AS (SELECT doc_id, ws,
                           unnest(range(0, (len(ws)-1)//10 + 1)) AS i FROM w)
            SELECT doc_id, i::int AS chunk_id,
                   array_to_string(ws[i*10+1 : i*10+10], ' ') AS chunk_text,
                   len(ws[i*10+1 : i*10+10]) AS n_words
            FROM idx
        """,
        "corpus_rollup": """
            -- avg_chars floor-scaled from the exact-int sum, mirroring
            -- the Spark side op-for-op (round(avg,2) is the banned
            -- cross-engine round-half flake class — r6 review)
            SELECT lang, source, count(*) AS docs, sum(n_chars)::bigint AS chars,
                   floor((sum(n_chars)::bigint::double / count(*)::double) * 100)
                     / 100 AS avg_chars,
                   min(doc_id) AS min_doc_id
            FROM documents GROUP BY lang, source
        """,
        "doc_embedding_join": """
            SELECT doc_id, lang, n_chars, label, len(embedding)::int AS dim
            FROM documents JOIN embeddings ON doc_id = vec_id
        """,
        "source_dispatch": """
            SELECT doc_id,
                   CASE WHEN n_chars < 100 THEN 'short'
                        WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS size_class,
                   CASE WHEN lang = 'en' THEN 'latin'
                        WHEN lang IN ('es','de','fr') THEN 'latin'
                        ELSE 'other' END AS script_class
            FROM documents
        """,
        "lang_source_rollup": """
            SELECT lang, source, count(*) AS docs, sum(n_chars)::bigint AS chars
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "lang_pivot": """
            SELECT source,
                   count(*) FILTER (lang = 'en') AS en,
                   count(*) FILTER (lang = 'es') AS es,
                   count(*) FILTER (lang = 'de') AS de,
                   count(*) FILTER (lang = 'fr') AS fr,
                   count(*) FILTER (lang = 'zh') AS zh
            FROM documents GROUP BY source
        """,
        "set_ops": """
            WITH long_docs AS (SELECT doc_id FROM documents WHERE n_chars >= 400),
            en_docs AS (SELECT doc_id FROM documents WHERE lang = 'en')
            SELECT doc_id, 'long_not_en' AS tag
            FROM (SELECT doc_id FROM long_docs EXCEPT ALL SELECT doc_id FROM en_docs)
            UNION ALL
            SELECT doc_id, 'long_and_en' AS tag
            FROM (SELECT doc_id FROM long_docs INTERSECT ALL SELECT doc_id FROM en_docs)
        """,
        "corpus_stats": """
            -- percentile_approx(accuracy=10000) is exact for <10k rows per
            -- group == quantile_disc; avg/std mirror the exact-bigint-sum +
            -- floor-scaling arithmetic op for op (identical IEEE doubles);
            -- p50/p90/p99 are the exact interpolated percentiles
            WITH s AS (
              SELECT lang, count(*) AS docs,
                     quantile_disc(n_chars, 0.5) AS p50_approx,
                     quantile_disc(n_chars, 0.9) AS p90_approx,
                     quantile_disc(n_chars, 0.99) AS p99_approx,
                     round(quantile_cont(n_chars, 0.5), 4) AS p50,
                     round(quantile_cont(n_chars, 0.9), 4) AS p90,
                     round(quantile_cont(n_chars, 0.99), 4) AS p99,
                     min(n_chars) AS min_chars, max(n_chars) AS max_chars,
                     sum(n_chars::bigint) AS s1,
                     -- cast BEFORE the multiply: INT32*INT32 overflows at
                     -- n_chars >= 46341 and aborts the oracle (r6 review)
                     sum(n_chars::bigint * n_chars) AS s2
              FROM documents GROUP BY lang)
            SELECT lang, docs, p50_approx, p90_approx, p99_approx,
                   p50, p90, p99, min_chars, max_chars,
                   floor((s1::double / docs::double) * 100) / 100 AS avg_chars,
                   floor(sqrt(greatest(
                     s2::double / docs::double
                       - (s1::double / docs::double) * (s1::double / docs::double),
                     0.0)) * 100) / 100 AS std_chars
            FROM s
        """,
        "sessionize_events": """
            WITH flagged AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                          THEN 1 ELSE 0 END AS boundary
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id, ts, value,
                     -- ::bigint: DuckDB windowed sum(int) is HUGEINT, which
                     -- pandas renders as float64 ('11.0' vs Spark's '11')
                     (sum(boundary) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING))::bigint AS session_id
              FROM flagged)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   round(sum(value::decimal(18,6)), 2)::double AS session_value
            FROM sess GROUP BY user_id, session_id
        """,
        "events_asof_last_purchase": """
            -- Mirrors as_of_join's STRUCT semantics exactly (r5 review):
            -- the carrier struct is non-NULL for every purchase row even
            -- when its value is NULL (so a NULL-valued purchase WINS and
            -- coalesces to -1.0, instead of an older value leaking
            -- through a per-column IGNORE NULLS); NULL-ts purchases are
            -- dropped like the Spark side, and NULLS FIRST matches
            -- Spark's asc_nulls_first default so NULL-ts clicks see no
            -- purchases.
            WITH clicks AS (
              SELECT user_id, event_id, ts, value FROM events
              WHERE event_type = 'click'),
            purch AS (
              SELECT user_id, event_id, ts, value AS pv FROM events
              WHERE event_type = 'purchase' AND ts IS NOT NULL),
            u AS (
              SELECT user_id, event_id, ts, value,
                     NULL::STRUCT(pv DOUBLE) AS v, 1 AS side
              FROM clicks
              UNION ALL
              SELECT user_id, event_id, ts, NULL::double,
                     struct_pack(pv := pv), 0 FROM purch),
            f AS (
              SELECT *, last_value(v IGNORE NULLS) OVER (
                PARTITION BY user_id
                ORDER BY ts NULLS FIRST, side, event_id
                ROWS UNBOUNDED PRECEDING) AS lastv
              FROM u)
            SELECT user_id, event_id, ts, value,
                   coalesce(lastv.pv, -1.0) AS last_purchase_value
            FROM f WHERE side = 1
        """,
        "events_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   round(sum(value::decimal(18,6)), 2)::double AS total_value,
                   count(DISTINCT user_id) AS users
            FROM events GROUP BY 1, 2
        """,
        "events_props_rollup": """
            -- json_valid + try_cast mirror the Spark side's from_json
            -- contract ('malformed rows yield null, never a job kill',
            -- relational.py): a bare ->> ::int CAST throws on the first
            -- malformed props row while Spark returns rows (r6 review)
            WITH p AS (
              SELECT event_type,
                     CASE WHEN json_valid(props)
                          THEN try_cast(props->>'k' AS int) END AS k
              FROM events)
            SELECT event_type, count(*) AS n_events,
                   sum(k)::bigint AS sum_k,
                   min(k) AS min_k,
                   max(k) AS max_k,
                   count(DISTINCT k) AS distinct_k
            FROM p GROUP BY event_type
        """,
        "high_value_order_lines": """
            SELECT l_returnflag, count(*) AS n_lines,
                   cast(round(sum(cast(l_extendedprice as decimal(18,6))), 2) as double) AS total_price
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders
              WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "strip_duplicate_substrings": rf"""
            WITH t(doc_id, text) AS (VALUES
              {_crafted_values('spans')}),
            w AS (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\f\r]+') AS ws FROM t),
            toks AS (
              SELECT doc_id, pos, word FROM (
                SELECT doc_id, i::int AS pos, ws[i + 1] AS word
                FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i FROM w))
              WHERE len(word) > 0),
            grams AS (
              SELECT doc_id, i::int AS pos, array_to_string(ws[i + 1 : i + 6], ' ') AS sh
              FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 5)) AS i FROM w)),
            ranked AS (
              SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn
              FROM grams),
            covered AS (
              SELECT DISTINCT doc_id, unnest(range(pos, pos + 6))::int AS pos
              FROM ranked WHERE rn > 1),
            kept AS (
              SELECT toks.doc_id, toks.pos, toks.word
              FROM toks LEFT JOIN covered USING (doc_id, pos)
              WHERE covered.pos IS NULL),
            agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text
                    FROM kept GROUP BY doc_id)
            SELECT t.doc_id::bigint AS doc_id, coalesce(agg.text, '') AS text
            FROM t LEFT JOIN agg USING (doc_id)
        """,
        "quality_stats": rf"""
            SELECT doc_id,
                   len(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+'))::int AS words,
                   len(regexp_extract_all(text, '[A-Za-z]'))::int AS alpha_chars,
                   len(regexp_extract_all(text, '[0-9]'))::int AS digit_chars,
                   len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\f\r]'))::int AS punct_chars,
                   len(list_filter(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+'),
                       w -> list_contains({_STOPWORDS_SQL}, w)))::int AS stop_hits,
                   list_max(list_transform(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+'),
                       w -> len(w)))::int AS max_word_len,
                   floor((0.4 * least(len(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+')) / 50.0, 1.0)
                       + 0.3 * (len(regexp_extract_all(text, '[A-Za-z]'))
                           / greatest(1, len(regexp_extract_all(text, '[A-Za-z]'))
                               + len(regexp_extract_all(text, '[0-9]'))
                               + len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\f\r]'))))
                       + 0.3 * least(5.0 * len(list_filter(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+'),
                           w -> list_contains({_STOPWORDS_SQL}, w)))
                           / greatest(len(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+')), 1), 1.0))
                       * 10000) / 10000 AS quality
            FROM documents
        """,
        "language_id": f"""
            WITH h AS (SELECT doc_id, {lang_hits} FROM documents)
            SELECT doc_id, en_hits::int AS en_hits, es_hits::int AS es_hits,
                   de_hits::int AS de_hits, fr_hits::int AS fr_hits,
                   {_PRED_LANG_CASE}
            FROM h
        """,
        "text_profile": rf"""
            WITH s AS (
              SELECT doc_id,
                     len(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+')) AS words,
                     len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]')) AS bpe_tokens,
                     len(text) AS chars,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha_chars,
                     len(regexp_extract_all(text, '[0-9]')) AS digit_chars,
                     len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\f\r]')) AS punct_chars,
                     len(list_filter(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+'),
                         w -> list_contains({_STOPWORDS_SQL}, w))) AS stop_hits,
                     list_max(list_transform(string_split_regex(lower(trim(text)), '[ \t\n\f\r]+'),
                         w -> len(w))) AS max_word_len,
                     {lang_hits}
              FROM documents)
            SELECT doc_id,
                   words::int AS ws_tokens, bpe_tokens::int AS bpe_tokens,
                   chars::int AS chars, words::int AS words,
                   alpha_chars::int AS alpha_chars, digit_chars::int AS digit_chars,
                   punct_chars::int AS punct_chars, stop_hits::int AS stop_hits,
                   max_word_len::int AS max_word_len,
                   en_hits::int AS en_hits, es_hits::int AS es_hits,
                   de_hits::int AS de_hits, fr_hits::int AS fr_hits,
                   floor((0.4 * least(words / 50.0, 1.0)
                       + 0.3 * (alpha_chars / greatest(1, alpha_chars + digit_chars + punct_chars))
                       + 0.3 * least(5.0 * stop_hits / greatest(words, 1), 1.0)) * 10000) / 10000 AS quality,
                   {_PRED_LANG_CASE}
            FROM s
        """,
        "redact_pii": f"""
            WITH t(doc_id, text) AS (VALUES
              {_crafted_values('pii')})
            SELECT doc_id::bigint AS doc_id,
                   {pii_counts},
                   {pii_redacted} AS redacted_text
            FROM t
        """,
        "repetition_stats": r"""
            WITH w AS (
              SELECT doc_id, unnest(string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\f\r]+')) AS w
              FROM documents),
            wc AS (SELECT doc_id, w, count(*) AS cnt FROM w GROUP BY doc_id, w),
            per_doc AS (
              SELECT doc_id, sum(cnt) AS words, count(*) AS distinct_words,
                     max(cnt) AS top_word_count
              FROM wc GROUP BY doc_id),
            bg AS (
              SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b FROM (
                SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM (
                  SELECT doc_id,
                         string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\f\r]+') AS ws
                  FROM documents)
                WHERE len(ws) >= 2)),
            bc AS (SELECT doc_id, max(cnt) AS top_bigram_count FROM (
                     SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY doc_id, b)
                   GROUP BY doc_id)
            SELECT p.doc_id, p.words::bigint AS words,
                   p.distinct_words::bigint AS distinct_words,
                   p.top_word_count::bigint AS top_word_count,
                   coalesce(bc.top_bigram_count, 0)::bigint AS top_bigram_count,
                   floor(p.distinct_words / p.words * 10000) / 10000 AS distinct_ratio,
                   floor(p.top_word_count / p.words * 10000) / 10000 AS top_word_frac
            FROM per_doc p LEFT JOIN bc ON p.doc_id = bc.doc_id
        """,
        "stratified_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (('0x' || substring(md5(coalesce(doc_id::varchar, '')), 1, 4))::int) % 100
                  < CASE WHEN lang = 'en' THEN 20
                         WHEN lang IN ('es','de','fr','zh') THEN 60
                         ELSE 0 END
        """,
        "deterministic_sample": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE (('0x' || substring(md5(coalesce(doc_id::varchar, '')), 1, 4))::int) % 100 < 10
        """,
        "fingerprints": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(coalesce(text, '')), '[^0-9a-z]+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "dedup_exact_groups": """
            SELECT md5(trim(regexp_replace(lower(coalesce(text, '')), '[^0-9a-z]+', ' ', 'g'))) AS fingerprint,
                   min(doc_id) AS rep_doc_id, count(*) AS group_size
            FROM documents GROUP BY 1
        """,
        "strip_duplicate_lines": rf"""
            WITH t(doc_id, text) AS (VALUES
              {_crafted_values('lines')}),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM t),
            lines AS (
              SELECT doc_id, i::int AS pos, ls[i + 1] AS line
              FROM (SELECT doc_id, ls, unnest(range(0, len(ls))) AS i FROM ls)),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY line ORDER BY doc_id, pos) AS rn,
                     len(string_split_regex(trim(line), '[ \t\n\f\r]+')) AS nw
              FROM lines),
            kept AS (SELECT doc_id, pos, line FROM ranked WHERE nw < 5 OR rn = 1),
            agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
                    FROM kept GROUP BY doc_id)
            SELECT t.doc_id::bigint AS doc_id, coalesce(agg.text, '') AS text
            FROM t LEFT JOIN agg USING (doc_id)
        """,
        "ngram_jaccard_pairs": """
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '[^0-9a-z]+', ' ', 'g')), ' ') AS ws
              FROM documents),
            idx AS (SELECT doc_id, ws,
                           unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS i FROM w),
            grams AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, array_to_string(ws[i+1 : i+3], ' ') AS gram FROM idx)
              WHERE len(gram) > 0),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
              FROM grams a JOIN grams b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(c / (sa.n + sb.n - c), 4) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(c / (sa.n + sb.n - c), 4) >= 0.02
        """,
        "embedding_near_pairs_exact": """
            -- non-finite cosine (zero-norm / corrupt vector) pins to 0.0
            -- exactly like the Spark side (dedup.cosine_sim_col): DuckDB
            -- sorts NaN ABOVE every double, so an unguarded NaN would
            -- pass the >= threshold and emit rows Spark never produces
            -- (r6 review). Residual accepted risk: list_cosine_similarity
            -- normalizes in a different IEEE op order than the left fold,
            -- so a value landing EXACTLY on a round(...,4) boundary could
            -- flip — deterministic corpus, observed green since r3.
            WITH s AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS raw
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT vec_a, vec_b,
                   round(CASE WHEN isfinite(raw) THEN raw ELSE 0.0 END, 4) AS cosine
            FROM s
            WHERE round(CASE WHEN isfinite(raw) THEN raw ELSE 0.0 END, 4) >= 0.3
        """,
        "label_centroids": """
            WITH x AS (
              SELECT label, i::int AS dim, e[i + 1]::decimal(38,18) AS xd
              FROM (SELECT label, embedding::DOUBLE[] AS e,
                           unnest(range(0, len(embedding))) AS i
                    FROM embeddings))
            SELECT label, dim, count(*)::bigint AS n,
                   floor((sum(xd)::double / count(*)::double) * 1000000)
                     / 1000000 AS mean_x
            FROM x GROUP BY label, dim
        """,
        "knn_brute_force": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv FROM embeddings
              ORDER BY vec_id LIMIT 8),
            scored AS (
              -- non-finite pinned to 0.0 like the Spark side (see
              -- embedding_near_pairs_exact rationale — r6 review)
              SELECT q.query_id, e.vec_id,
                     round(CASE WHEN isfinite(list_cosine_similarity(
                         q.qv::DOUBLE[], e.embedding::DOUBLE[]))
                       THEN list_cosine_similarity(
                         q.qv::DOUBLE[], e.embedding::DOUBLE[])
                       ELSE 0.0 END, 4) AS cosine
              FROM q CROSS JOIN embeddings e)
            SELECT query_id, rank::int AS rank, vec_id, cosine FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "point_lookup": """
            SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42
        """,
        "llm_record_ingest": r"""
            WITH resp(url, chunk_id, response) AS (VALUES
              """ + _crafted_values("llm") + r"""),
            ext AS (SELECT url, chunk_id,
              trim(CASE WHEN regexp_extract(response, '```json([\s\S]+?)```', 1) <> ''
                   THEN regexp_extract(response, '```json([\s\S]+?)```', 1)
                   ELSE response END) AS cand FROM resp),
            parsed AS (SELECT url, chunk_id,
              -- r6 review: the array-shape guards mirror the Spark side
              -- exactly — a bare JSON object is NOT a one-record array
              -- (cand LIKE '[%'), and an array with non-object elements
              -- rejects like Spark's from_json does (element-type check;
              -- empty array stays valid via the coalesce)
              CASE WHEN json_valid(cand) AND cand LIKE '[%'
                     AND coalesce(list_bool_and(list_transform(
                           try_cast(cand AS JSON[]),
                           x -> json_type(x) = 'OBJECT')), TRUE)
                   THEN json_transform(cand,
                '[{"SucursalName":"VARCHAR","EAN":"VARCHAR",
                   "CantidadVendida":"VARCHAR","Importe":"VARCHAR"}]') END AS recs
              FROM ext),
            good AS (SELECT url, chunk_id,
                unnest(range(len(recs)))::int AS record_pos, 1 AS parse_ok,
                unnest(recs) AS rec
              FROM parsed WHERE recs IS NOT NULL)
            SELECT url, chunk_id, record_pos, parse_ok,
                   rec.SucursalName AS SucursalName, rec.EAN AS EAN,
                   rec.CantidadVendida AS CantidadVendida, rec.Importe AS Importe
            FROM good
            UNION ALL
            -- marker rows: invalid JSON (parse_ok=0) AND valid EMPTY
            -- arrays (parse_ok=1) — Spark's posexplode_outer emits one
            -- null row for empty arrays too (pinned in
            -- tests/test_llm_responses.py; r6 generator adds [] rows)
            SELECT url, chunk_id, NULL::int,
                   CASE WHEN recs IS NULL THEN 0 ELSE 1 END,
                   NULL, NULL, NULL, NULL
            FROM parsed WHERE recs IS NULL OR len(recs) = 0
        """,
        "csv_serialization": rf"""
            WITH recs(url, chunk_id, block_pos, record_pos,
                      SucursalName, EAN, CantidadVendida, Importe) AS (VALUES
              {_crafted_values('csv')}),
            lines AS (SELECT url, chunk_id, block_pos, record_pos,
              '"' || SucursalName || '","' || EAN || '",' ||
              coalesce(try_cast(regexp_extract(CantidadVendida,
                  '^\s*([+-]?[0-9]+)', 1) AS BIGINT), 0) || ',' ||
              printf('%.2f', coalesce(try_cast(regexp_extract(Importe,
                  '^\s*([+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)',
                  1) AS DOUBLE), 0.0)) AS line
              FROM recs)
            SELECT url,
                   'SucursalName,EAN,CantidadVendida,Importe' || chr(10) ||
                   string_agg(line, chr(10)
                     -- line as final tiebreaker mirrors Spark's
                     -- sort_array(struct(ord, line)) exactly; keys are
                     -- unique per url by construction, this is defense
                     ORDER BY chunk_id, block_pos, record_pos, line) AS csv
            FROM lines GROUP BY url
        """,
    }
    # Non-SQL-expressible operators (custom kernels / signature hashing /
    # iterative k-means): the expected output is recomputed in-process
    # with the SAME deterministic kernels and pinned as a VALUES table
    # (tools/oracle_values.py documents why each replication is exact).
    # Built as thunks so `_only` can skip the expensive replays.
    lazy = {
        "extraction_pdf_e2e": lambda: _ov.extraction_e2e_oracle(120),
        "extraction_status_metrics": lambda: _ov.extraction_status_metrics_oracle(120),
        "winnow_fingerprints": lambda: _ov.winnow_oracle(_ov.oracle_sf_dir()),
        "media_features": lambda: _ov.media_oracle(90),
        "image_resize": lambda: _ov.image_resize_oracle(90),
        "audio_resample": lambda: _ov.audio_resample_exec_oracle(90),
        "minhash_dedup_pairs": lambda: _ov.minhash_oracle(
            _ov.oracle_sf_dir(), threshold=0.2
        ),
        "dedup_corpus": lambda: _ov.dedup_corpus_oracle(
            _ov.oracle_sf_dir(), near_threshold=0.5
        ),
        "near_dup_clusters": lambda: _ov.near_dup_clusters_oracle(
            _ov.oracle_sf_dir(), threshold=0.5
        ),
        "simhash_near_pairs": lambda: _ov.simhash_oracle(
            _ov.oracle_sf_dir(), max_hamming=3
        ),
        "knn_lsh": lambda: _ov.knn_lsh_oracle(
            _ov.oracle_sf_dir(), n_queries=8, dim=64, k=5
        ),
        "knn_ivf": lambda: _ov.knn_ivf_oracle(
            _ov.oracle_sf_dir(), n_queries=8, dim=64, k=5, n_cells=8, n_probe=3,
            sample_pct=50,
        ),
        "embedding_near_pairs": lambda: _ov.embedding_near_pairs_oracle(
            _ov.oracle_sf_dir(), threshold=0.3, dim=64
        ),
        "streaming_minute_metrics": lambda: _ov.streaming_minute_oracle(200),
        "streaming_dedup_by_url": lambda: _ov.streaming_dedup_oracle(200),
    }
    for _k, _thunk in lazy.items():
        if _only is None or _k in _only:
            out[_k] = _thunk()
    if _only is not None:
        out = {k: v for k, v in out.items() if k in _only}
    return out
