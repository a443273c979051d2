"""Sketch / summary-statistics operators.

At 10^12 docs, exact distinct counts and percentiles are either a huge
shuffle or a sketch; both shapes matter:

  * corpus_sketches — HyperLogLog distinct (approx_count_distinct) +
    t-digest-style percentile_approx + moments, all in ONE pass with
    map-side partial sketches (the shuffle carries sketch bytes, not
    rows).
  * corpus_percentiles — the exact interpolated percentiles (Spark
    `percentile`), semantics shared with DuckDB quantile_cont → oracle-
    checkable; the correctness baseline the sketches are judged against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_sketches(documents: DataFrame) -> DataFrame:
    """One-pass sketch summary of a corpus (per-lang)."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.approx_count_distinct("source", rsd=0.02).alias("approx_sources"),
            F.approx_count_distinct("doc_id", rsd=0.02).alias("approx_docs"),
            F.percentile_approx("n_chars", [0.5, 0.9, 0.99], 10000).alias(
                "n_chars_p50_p90_p99"
            ),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.stddev_pop("n_chars"), 2).alias("std_chars"),
        )
    )


def corpus_percentiles(documents: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per lang (the sketch ground truth)."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
