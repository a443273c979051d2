"""Per-query isolation bench + plan capture (guide §1.4) — NOT the
driver's artifact. bench.py stays the frozen measurement contract; this
file exists so optimization work can time one query at a time with the
noop sink, at any SF, and dump `.explain("formatted")` for plans/r07/.

Usage:
  python bench_extra.py [query ...]            # time (default all)
  python bench_extra.py --plans plans/r07 --suffix before [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PTS_BENCH_REPS (best-of-N).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = pathlib.Path(args[i + 1])
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("PTS_BENCH_REPS", "2"))

    repo = pathlib.Path(__file__).resolve().parent
    sys.path.insert(0, str(repo))

    from pdf_to_text_spark.config import build_spark
    from pdf_to_text_spark.operators import dedup, relational, similarity, text_analysis
    from pdf_to_text_spark.operators.extraction import (
        html_roundtrip_extract,
        run_extraction,
    )

    spark = build_spark(
        "pts-bench-extra", master=f"local[{cpus}]", shuffle_partitions=max(32, 2 * cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench.scaling import pages_cache_path, prune_stale_benchdata
    from pdf_to_text_spark.sources.pages import write_pages

    prune_stale_benchdata()
    n_pages = int(os.environ.get("PTS_BENCH_PAGES", "24000"))
    n_parts = max(64, 4 * cpus)
    pages_path = pages_cache_path(n_pages, n_parts)
    if not (pages_path / "_SUCCESS").exists():
        write_pages(spark, n_pages, str(pages_path), num_partitions=n_parts)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pages = spark.read.parquet(str(pages_path))
    docs_1k = docs.where(docs.doc_id < 1000)

    headline = {
        "extract_pages": lambda: run_extraction(pages),
        "extract_html_roundtrip": lambda: html_roundtrip_extract(docs),
        "pricing_summary": lambda: relational.pricing_summary(lineitem),
        "top_nation_revenue": lambda: relational.top_nation_revenue(orders, customer, nation),
        "latest_event_per_user": lambda: relational.latest_event_per_user(events),
        "word_chunk_reassembly": lambda: relational.word_chunk_reassembly(docs),
        "token_quality_langid": lambda: text_analysis.text_profile(docs),
        "fingerprint_dedup_exact": lambda: dedup.dedup_exact_groups(docs),
        "minhash_dedup_pairs": lambda: dedup.minhash_dedup_pairs(docs, threshold=0.2),
        "line_dedup_strip": lambda: dedup.strip_duplicate_lines(docs),
        "simhash_near_pairs": lambda: dedup.simhash_near_pairs(docs, max_hamming=3),
        "ngram_jaccard_1k": lambda: dedup.ngram_jaccard_pairs(docs_1k, threshold=0.02),
        "knn_brute_force": lambda: similarity.brute_force_topk(
            emb, similarity.queries_from_corpus(emb, 16), k=10
        ),
        "knn_lsh": lambda: similarity.lsh_topk(
            emb, similarity.queries_from_corpus(emb, 16), dim=64, k=10
        ),
        # sub-stage isolation targets (not in the headline suite)
        "minhash_signatures_only": lambda: dedup.minhash_signatures(docs),
        "simhash_signatures_only": lambda: dedup.simhash_signatures(docs),
    }

    names = args or [n for n in headline if not n.endswith("_only")]
    for n in names:
        if n not in headline:
            raise SystemExit(f"unknown query {n!r}; known: {sorted(headline)}")

    if plans_dir is not None:
        plans_dir.mkdir(parents=True, exist_ok=True)
        for n in names:
            df = headline[n]()
            p = plans_dir / f"{n}_{suffix}.txt"
            p.write_text(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
            print(f"wrote {p}", file=sys.stderr)
        spark.stop()
        return 0

    # warm the worker pool (same rationale as bench.py)
    run_extraction(pages.limit(8 * cpus).repartition(cpus)).write.format("noop").mode(
        "overwrite"
    ).save()

    times = {}
    for n in names:
        best = float("inf")
        samples = []
        for _ in range(max(1, reps)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {n}")
            t0 = time.perf_counter()
            headline[n]().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        times[n] = {"best": round(best, 3), "samples": samples}
        print(f"{n}: {times[n]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": times}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
