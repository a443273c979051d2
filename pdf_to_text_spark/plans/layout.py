"""Partition layout: url-hash bucketing + salted skew-flattening repartition.

North-star requirements (BASELINE.json): "partitions by url-hash buckets
with salted repartitioning to defuse skew from megabyte-scale PDFs".

At 100 TB the bucket column is also the table partition/sort key, so file
pruning and co-located resume both key on it; in the sandbox it drives the
shuffle layout only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import N_BUCKETS, SKEW_SALT


def with_bucket(df: DataFrame, url_col: str = "url", n_buckets: int = N_BUCKETS) -> DataFrame:
    """bucket = pmod(xxhash64(url), n_buckets) — deterministic, JVM-side."""
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)))


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    url_col: str = "url",
    salt_mod: int = SKEW_SALT,
) -> DataFrame:
    """Spread each url-hash bucket across `salt_mod` shuffle partitions.

    Mega-documents concentrate in few buckets (FIXTURES.md skew knob); a
    plain repartition("bucket") would put all of them in the same tasks.
    Salting with a second, independent hash of the url (seeded via a
    prefix so it decorrelates from the bucket hash) flattens the heavy
    buckets while keeping the shuffle deterministic. Used before the
    extraction mapInPandas so task input sizes stay balanced.
    """
    salt = F.pmod(F.xxhash64(F.concat(F.lit("salt:"), F.col(url_col))), F.lit(salt_mod))
    return df.repartition(num_partitions, F.col("bucket"), salt)


def with_lineage(df: DataFrame) -> DataFrame:
    """Per-partition lineage columns for the metrics table (north_rule)."""
    return df.withColumn("partition_id", F.spark_partition_id()).withColumn(
        "input_file", F.input_file_name()
    )
