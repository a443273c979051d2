"""Custom stateful streaming operators (applyInPandasWithState).

Two operators a continuous-crawl deployment needs beyond stateless
extraction:

  * dedup_stream_by_url — cross-microbatch dedup: keeps the newest
    warc_ts seen per url in state and emits a row only when a strictly
    newer crawl of that url arrives. This is the streaming analogue of
    the batch dedup window; state is one timestamp per url, grouped by
    url hash so state distributes with the shuffle.
  * url_crawl_stats_stream — running per-url counters (crawl count,
    first/last seen) maintained in state, emitted on every update.

Both use GroupState with a processing-time timeout hook left NoTimeout
here (a production crawl would expire urls not re-seen for N days to
bound state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_DEDUP_STATE = StructType([StructField("max_ts", LongType())])
_DEDUP_OUT = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("lang", StringType()),
        StructField("is_first_crawl", IntegerType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    max_ts = state.get[0] if state.exists else None
    rows = []
    first = 0 if state.exists else 1
    items = []
    for pdf in pdfs:
        items.extend(zip(pdf["warc_ts"], pdf["lang"]))
    # event-time order within one invocation: shuffle arrival order is
    # arbitrary, so without this the emitted row SET would be
    # nondeterministic (newer-first arrival swallows the older crawl).
    # lang is the tiebreak for EXACT-ts duplicates (r5 review): a
    # ts-only sort is stable on arrival order, so which lang survived
    # an exact-ts tie differed run to run
    # NOTE: .value on the naive Timestamps Arrow hands this fn is only a
    # monotonic instant because build_spark pins spark.sql.session.timeZone
    # to UTC — under a DST-observing session tz, wall-clock .value goes
    # BACKWARD across fall-back and a strictly newer crawl would be
    # dropped by the max_ts compare below (r6 review)
    items.sort(key=lambda t: (t[0].value, t[1] or ""))
    for ts, lang in items:
        ts_us = int(ts.value // 1000)  # pandas Timestamp → µs epoch
        if max_ts is None or ts_us > max_ts:
            max_ts = ts_us
            rows.append((url, ts, lang, first))
            first = 0
    if max_ts is not None:
        state.update((max_ts,))
    if rows:
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "lang", "is_first_crawl"])


def dedup_stream_by_url(pages_stream: DataFrame) -> DataFrame:
    """Emit (url, warc_ts, lang, is_first_crawl) only for strictly-newer
    crawls of each url; duplicates and stale re-crawls are dropped across
    microbatches via per-url state."""
    return (
        # NULL warc_ts rows have no position on the crawl-time axis and
        # would surface as NaT/int64-min sentinels inside the state fn —
        # drop them here (the batch window's desc_nulls_last never lets
        # them win either)
        pages_stream.select("url", "warc_ts", "lang")
        .where(F.col("warc_ts").isNotNull())
        .groupBy("url")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_DEDUP_OUT,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_STATS_STATE = StructType(
    [
        StructField("crawls", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)
_STATS_OUT = StructType(
    [
        StructField("url", StringType()),
        StructField("crawls", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    crawls, first_us, last_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        for ts in pdf["warc_ts"]:
            us = int(ts.value // 1000)
            crawls += 1
            first_us = us if first_us is None else min(first_us, us)
            last_us = us if last_us is None else max(last_us, us)
    if crawls:
        state.update((crawls, first_us, last_us))
        yield pd.DataFrame(
            {
                "url": [url],
                "crawls": [crawls],
                "first_seen": [pd.Timestamp(first_us * 1000)],
                "last_seen": [pd.Timestamp(last_us * 1000)],
            }
        )


def url_crawl_stats_stream(pages_stream: DataFrame) -> DataFrame:
    """Running per-url crawl statistics, state-backed."""
    return (
        pages_stream.select("url", "warc_ts")
        .where(F.col("warc_ts").isNotNull())  # see dedup_stream_by_url
        .groupBy("url")
        .applyInPandasWithState(
            _stats_fn,
            outputStructType=_STATS_OUT,
            stateStructType=_STATS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
