"""Shared distributed primitives."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def with_global_seq(df: DataFrame, order_cols: list[str],
                    col_name: str = "seq", offset: int = 0) -> DataFrame:
    """Deterministic dense global sequence following `order_cols`, without a
    single-partition window: range-repartition + per-partition sort, then
    zipWithIndex (which offsets per-partition counts - two passes, fully
    distributed). The serial reference's FIFO positions become this column.
    """
    if not df.take(1):
        return df.withColumn(col_name, F.lit(None).cast(LongType()))
    sdf = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    schema = sdf.schema.add(col_name, LongType())
    rdd = sdf.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + offset))
    return sdf.sparkSession.createDataFrame(rdd, schema)


def seen_anti_join(candidates: DataFrame, seen: DataFrame,
                   key: str = "url") -> DataFrame:
    """URL-seen dedup: exact left-anti join, bloom-accelerated (north_rule).

    The bloom pre-filter is Catalyst's own: with
    spark.sql.optimizer.runtime.bloomFilter.enabled=true (default, set
    explicitly in session.py) the optimizer injects a BloomFilterAggregate
    over the seen side and a might_contain runtime filter on the candidate
    side of this shuffle anti-join, so only ~fpp of definitely-new
    candidates pay the exact join shuffle. (bloom_filter_agg is not a
    user-registrable SQL routine in this Spark build, so we rely on the
    injected form rather than hand-rolling one; the exact anti-join remains
    the authoritative check either way - no false drops possible.)

    We additionally pre-hash the key with xxhash64 into the join so the
    shuffle exchanges 8-byte keys + url payload rather than comparing long
    strings during the hash join probe.
    """
    k = F.xxhash64(F.col(key))
    c = candidates.withColumn("_kh", k)
    s = seen.select(F.col(key), k.alias("_kh"))
    return c.join(s, ["_kh", key], "left_anti").drop("_kh")
