"""Bucketed-table layout: co-located, exchange-free joins.

At 100 TB the extracted table is joined repeatedly (golden compares,
enrichment joins, incremental dedup). Writing it bucketed+sorted by the
join key once means every later equi-join on that key is a zero-shuffle
SortMergeJoin — the exchange happens at write time, amortized over all
future reads. This module wraps the saveAsTable bucketing API and a
verifier that the join plan really has no Exchange.
"""

from __future__ import annotations

import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_orphaned_location(spark: SparkSession, table: str) -> None:
    """Remove a managed-table directory the catalog no longer knows about.

    The default in-memory catalog forgets tables at session exit but their
    warehouse directories survive; a later overwrite-write then fails with
    LOCATION_ALREADY_EXISTS because saveAsTable takes the CREATE path (no
    catalog entry ⇒ nothing to overwrite). Only fires when the table is
    absent from the catalog AND the location is a local path — exactly the
    orphan case; a catalog-known table goes through overwrite normally.

    Qualified names resolve to the qualified managed location: 'db.tbl'
    lives at <warehouse>/db.db/tbl, NOT <warehouse>/tbl — mapping every
    name to the bare-name path would rmtree an unrelated live default-db
    table's data while leaving the real orphan behind (r6 review)."""
    if spark.catalog.tableExists(table):
        return
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return  # remote warehouse: leave cleanup to the real catalog
    parts = table.lower().split(".")
    name = parts[-1]
    db = parts[-2] if len(parts) >= 2 else None
    rel = name if db in (None, "default") else f"{db}.db/{name}"
    loc = (wh.path or wh.netloc) + "/" + rel
    shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist bucketed+sorted by `key` (hash-bucket pruning + co-located
    joins). Uses the session catalog/warehouse (spark.sql.warehouse.dir)."""
    if mode == "overwrite":
        _drop_orphaned_location(df.sparkSession, table)
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
    'Exchange' substring match would flag it (r3 review). A
    ReusedExchange node inherits the classification of the operator it
    reuses: a reused broadcast (same small side consumed twice, e.g. a
    self-join) is still not a shuffle (r6 review). The reuse target id
    appears ONLY in the details section ("(12) ReusedExchange [Reuses
    operator id: 5]") — the tree line is a bare "ReusedExchange (12)",
    so the tree scan must resolve its node id through that map (second
    r6 review: matching 'Reuses operator id' on the tree line itself
    never fired)."""
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    broadcast_ids = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    reuse_target = dict(
        re.findall(r"\((\d+)\) ReusedExchange \[Reuses operator id: (\d+)\]", plan)
    )
    reused_broadcast_ids = {
        nid for nid, tgt in reuse_target.items() if tgt in broadcast_ids
    }
    for line in plan.splitlines():
        if "Exchange" not in line or "BroadcastExchange" in line:
            continue
        node = re.search(r"ReusedExchange(?: \[[^]]*\])? \((\d+)\)|\((\d+)\) ReusedExchange", line)
        if node and (node.group(1) or node.group(2)) in reused_broadcast_ids:
            continue
        return True
    return False
