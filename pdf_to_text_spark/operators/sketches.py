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


def _moment_exprs():
    """The shared exact-moment machinery (r5 review: was duplicated in
    corpus_sketches and corpus_stats, and only the latter is oracle-
    gated — a one-sided edit could silently diverge them).

    Returns (agg_exprs, select_exprs): exact integer/decimal sums as the
    aggregation inputs, floor-scaled avg/std as the derived outputs.
    Squares accumulate in decimal(38,0): a BIGINT running sum overflows
    at ~1e9 docs x (1e5 chars)^2 — inside the 10^12-doc design point —
    and ANSI mode turns that into a hard job failure (r3 review).
    Moments from exact sums, not Welford: double accumulation is
    partition-order dependent in the last bit."""
    # cast the OPERAND to decimal before squaring: `n_chars * n_chars`
    # in the input integer type overflows first (an INT n_chars column —
    # the natural F.length() derivation — overflows at 46341 chars, a
    # 46 KB doc) and ANSI mode turns that into a job failure before the
    # protective decimal cast ever runs (r6 review). decimal(19,0)² →
    # decimal(38,0) exactly.
    _nc = F.col("n_chars").cast("decimal(19,0)")
    aggs = [
        F.sum(F.col("n_chars").cast("long")).alias("_s1"),
        F.sum((_nc * _nc).cast("decimal(38,0)")).alias("_s2"),
    ]
    mean = F.col("_s1").cast("double") / F.col("docs").cast("double")
    var = F.col("_s2").cast("double") / F.col("docs").cast("double") - mean * mean
    selects = [
        (F.floor(mean * 100) / 100).alias("avg_chars"),
        (F.floor(F.sqrt(F.greatest(var, F.lit(0.0))) * 100) / 100).alias("std_chars"),
    ]
    return aggs, selects


def corpus_sketches(documents: DataFrame) -> DataFrame:
    """One-pass sketch summary of a corpus (per-lang).

    Scalar output columns only (the driver's canonicalizer sorts result
    frames with pandas, which cannot hash/sort list cells — VERDICT r1 #2),
    and moment stats are derived from exact integer sums + floor-scaling so
    the values are order-independent and engine-portable: Welford-style
    stddev accumulates doubles in partition order, which flips the last bit
    run to run; sum/sum-of-squares over ints is exact either way.
    """
    moment_aggs, moment_sel = _moment_exprs()
    agg = documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.approx_count_distinct("source", rsd=0.02).alias("approx_sources"),
        F.approx_count_distinct("doc_id", rsd=0.02).alias("approx_docs"),
        F.percentile_approx("n_chars", [0.5, 0.9, 0.99], 10000).alias("_p"),
        *moment_aggs,
    )
    return agg.select(
        "lang",
        "docs",
        "approx_sources",
        "approx_docs",
        F.element_at("_p", 1).alias("p50_approx"),
        F.element_at("_p", 2).alias("p90_approx"),
        F.element_at("_p", 3).alias("p99_approx"),
        *moment_sel,
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


def corpus_stats(documents: DataFrame) -> DataFrame:
    """corpus_sketches ∪ corpus_percentiles in ONE grouped pass — the
    driver-facing merge (round 3): approx sketches, exact moment stats,
    exact interpolated percentiles, and min/max, all from a single
    (lang)-keyed aggregation with map-side partials. Scalar columns
    only; same floor-scaling / exact-int-sum rationale as
    corpus_sketches."""
    moment_aggs, moment_sel = _moment_exprs()
    agg = documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.percentile_approx("n_chars", [0.5, 0.9, 0.99], 10000).alias("_p"),
        F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))").alias("_pe"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        *moment_aggs,
    )
    return agg.select(
        "lang",
        "docs",
        F.element_at("_p", 1).alias("p50_approx"),
        F.element_at("_p", 2).alias("p90_approx"),
        F.element_at("_p", 3).alias("p99_approx"),
        F.round(F.element_at("_pe", 1), 4).alias("p50"),
        F.round(F.element_at("_pe", 2), 4).alias("p90"),
        F.round(F.element_at("_pe", 3), 4).alias("p99"),
        "min_chars",
        "max_chars",
        *moment_sel,
    )
