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
    verifier (r6 review): same broadcast consumed twice in one plan.

    AQE is forced OFF so the planner materializes the ReusedExchange
    pre-execution — under AQE it never appears in the formatted plan and
    the exemption path is dormant (second r6 review: the first fix
    matched 'Reuses operator id' on the TREE line, which is a bare
    'ReusedExchange (N)'; the annotation only exists in the details
    section, so the exemption never fired)."""
    from pdf_to_text_spark.plans.bucketing import plan_has_exchange, write_bucketed

    spark = bucketed_spark
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed(docs, "docs_b", "doc_id", n_buckets=8)
    big = spark.table("docs_b")
    prior_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        small = spark.range(0, 50).withColumnRenamed("id", "doc_id")
        twice = big.join(F.broadcast(small), "doc_id").unionAll(
            big.join(F.broadcast(small), "doc_id")
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            twice._jdf.queryExecution(), "formatted"
        )
        assert "ReusedExchange" in plan, "exemption path not exercised"
        assert not plan_has_exchange(twice)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", prior_aqe)


def test_reused_shuffle_is_still_a_shuffle(bucketed_spark):
    """The ReusedExchange exemption must be broadcast-ONLY: reuse of a
    shuffle Exchange is still data movement keyed on the join key."""
    from pdf_to_text_spark.plans.bucketing import plan_has_exchange

    spark = bucketed_spark  # broadcast already disabled by the fixture
    prior_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        a = spark.range(0, 1000).withColumnRenamed("id", "k")
        b = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = a.join(b, "k")
        twice = joined.unionAll(joined)
        plan = spark._jvm.PythonSQLUtils.explainString(
            twice._jdf.queryExecution(), "formatted"
        )
        assert plan_has_exchange(twice)
        if "ReusedExchange" not in plan:  # planner chose not to reuse: the
            return  # positive half above still holds
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior_aqe)


def test_orphan_drop_qualified_name_spares_default_table(bucketed_spark):
    """_drop_orphaned_location('db.tbl') must target <wh>/db.db/tbl — the
    bare-name mapping rmtree'd a LIVE default-db table named 'tbl' and
    left the real orphan behind (r6 review)."""
    import pathlib
    from urllib.parse import urlparse

    from pdf_to_text_spark.plans.bucketing import _drop_orphaned_location

    spark = bucketed_spark
    wh = pathlib.Path(
        urlparse(spark.conf.get("spark.sql.warehouse.dir")).path or "spark-warehouse"
    )
    live = wh / "docs_b"
    live.mkdir(parents=True, exist_ok=True)
    (live / "part-live.parquet").write_bytes(b"live")
    orphan = wh / "analytics.db" / "docs_b"
    orphan.mkdir(parents=True, exist_ok=True)
    (orphan / "part-stale.parquet").write_bytes(b"stale")
    try:
        _drop_orphaned_location(spark, "analytics.docs_b")
        assert (live / "part-live.parquet").exists(), "live default-db data deleted"
        assert not orphan.exists(), "real qualified orphan left behind"
    finally:
        import shutil

        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(wh / "analytics.db", ignore_errors=True)
