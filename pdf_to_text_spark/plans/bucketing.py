"""Bucketed-table layout: co-located, exchange-free joins.

At 100 TB the extracted table is joined repeatedly (golden compares,
enrichment joins, incremental dedup). Writing it bucketed+sorted by the
join key once means every later equi-join on that key is a zero-shuffle
SortMergeJoin — the exchange happens at write time, amortized over all
future reads. This module wraps the saveAsTable bucketing API and a
verifier that the join plan really has no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist bucketed+sorted by `key` (hash-bucket pruning + co-located
    joins). Uses the session catalog/warehouse (spark.sql.warehouse.dir)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two same-bucketed tables — no Exchange in the plan."""
    return spark.table(left_table).join(spark.table(right_table), key)


def plan_has_exchange(df: DataFrame) -> bool:
    """True iff the plan contains a SHUFFLE exchange.

    BroadcastExchange is not a shuffle — in a default-config session a
    small bucketed side legitimately broadcasts, and the co-location
    claim ("no data movement keyed on the join key") still holds; a bare
    'Exchange' substring match would flag it (r3 review)."""
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
