"""Bucketed co-located join: the write-time exchange buys shuffle-free
joins forever after — pinned by asserting no Exchange in the join plan."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_spark(tmp_path_factory):
    from pdf_to_text_spark.config import build_spark

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = build_spark(
        "bucketing-test",
        master="local[4]",
        shuffle_partitions=8,
        extra={"spark.sql.warehouse.dir": wh, "spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    yield spark
    spark.stop()


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
