"""Custom stateful streaming operator: per-host crawl accounting with
applyInPandasWithState.

The batch engine enforces politeness per round; the streaming view needs
state ACROSS micro-batches: cumulative fetches/bytes per host and an
over-budget flag that persists. GroupState holds (fetches, bytes) per host;
each micro-batch folds its pages in and emits the running totals - the
streaming analog of the reference's per-domain accounting
(MAX_URLS_PER_DOMAIN, Serial Version/config.ini:12) that the C code
documents but never enforces.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

from ..functions.urlsql import host_col

STATE_SCHEMA = StructType([
    StructField("fetches", LongType()),
    StructField("bytes", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("total_fetches", LongType()),
    StructField("total_bytes", LongType()),
    StructField("over_budget", BooleanType()),
])


def host_budget_tracker(pages_stream: DataFrame,
                        budget: int = 1000) -> DataFrame:
    """Streaming per-host cumulative fetch/byte counters with persistent
    GroupState; emits one row per (host, micro-batch) with running totals
    and the over-budget flag."""

    def track(key: Tuple[str], batches: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        fetches, nbytes = state.get if state.exists else (0, 0)
        for pdf in batches:
            fetches += len(pdf)
            nbytes += int(pdf["n_bytes"].sum())
        state.update((fetches, nbytes))
        yield pd.DataFrame({
            "host": [key[0]],
            "total_fetches": [fetches],
            "total_bytes": [nbytes],
            "over_budget": [fetches > budget],
        })

    per_host = pages_stream.select(
        host_col(F.col("url")).alias("host"),
        F.length("html").alias("n_bytes"))
    return per_host.groupBy("host").applyInPandasWithState(
        track, outputStructType=OUTPUT_SCHEMA, stateStructType=STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
