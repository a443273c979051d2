"""Bucketed co-located join: the write-time exchange buys shuffle-free
joins forever after — pinned by asserting no Exchange in the join plan."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_spark(spark):
    # Reuse the session-scoped SparkSession. A module-local build_spark()
    # here only APPEARS to make a fresh session — getOrCreate returns the
    # existing one, static confs (warehouse dir) are silently dropped, and
    # stopping it at teardown killed every later test file (r6 review).
    # Broadcast is disabled via runtime conf so the control join below
    # really plans a shuffle; tables are dropped (catalog + location) on
    # the way out so reruns and other files never see leftovers.
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    from pdf_to_text_spark.plans.bucketing import _drop_orphaned_location

    for t in ("docs_b", "emb_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _drop_orphaned_location(spark, t)


def test_bucketed_join_has_no_exchange(bucketed_spark):
    from pdf_to_text_spark.plans.bucketing import (
        colocated_join,
        plan_has_exchange,
        write_bucketed,
    )

    spark = bucketed_spark
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    write_bucketed(docs, "docs_b", "doc_id", n_buckets=8)
    write_bucketed(emb, "emb_b", "doc_id", n_buckets=8)

    joined = colocated_join(spark, "docs_b", "emb_b", "doc_id")
    assert not plan_has_exchange(joined), "bucketed join must not shuffle"
    assert joined.count() == docs.count()

    # control: the same join on plain parquet DOES need an exchange
    plain = docs.join(emb, "doc_id")
    assert plan_has_exchange(plain)


def test_write_bucketed_recovers_orphaned_location(bucketed_spark):
    """Catalog forgot the table (session restart) but the warehouse dir
    survived — overwrite must recover, not LOCATION_ALREADY_EXISTS."""
    from pdf_to_text_spark.plans.bucketing import write_bucketed

    spark = bucketed_spark
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed(docs, "docs_b", "doc_id", n_buckets=8)
    n = spark.table("docs_b").count()
    # simulate the restart: catalog entry gone, directory left behind
    spark.sql("DROP TABLE docs_b")
    import pathlib
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    loc = pathlib.Path((wh.path or wh.netloc)) / "docs_b"
    loc.mkdir(parents=True, exist_ok=True)
    (loc / "orphan.parquet").write_bytes(b"stale")
    write_bucketed(docs, "docs_b", "doc_id", n_buckets=8)  # must not raise
    assert spark.table("docs_b").count() == n


def test_reused_broadcast_is_not_a_shuffle(bucketed_spark):
    """ReusedExchange of a BroadcastExchange must not trip the no-shuffle
    verifier (r6 review): same broadcast consumed twice in one plan."""
    from pdf_to_text_spark.plans.bucketing import plan_has_exchange, write_bucketed

    spark = bucketed_spark
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed(docs, "docs_b", "doc_id", n_buckets=8)
    big = spark.table("docs_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        small = spark.range(0, 50).withColumnRenamed("id", "doc_id")
        twice = big.join(F.broadcast(small), "doc_id").unionAll(
            big.join(F.broadcast(small), "doc_id")
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            twice._jdf.queryExecution(), "formatted"
        )
        if "ReusedExchange" in plan:
            assert not plan_has_exchange(twice)
        else:  # planner didn't reuse — still must classify broadcasts clean
            assert not plan_has_exchange(twice)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
