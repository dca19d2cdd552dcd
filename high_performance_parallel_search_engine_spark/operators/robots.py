"""Robots rules (north_rule requirement; the reference only DOCUMENTS robots
compliance - Serial Version/docs/architecture.md:26 - and implements none, so
these semantics are ours, specified in kernel/bfs.py:robots_allowed).

Rules table: (host, rule 'allow'|'disallow', path_prefix). Longest matching
prefix wins; equal-length tie -> disallow; no matching rule / no rules for
host -> allow. Applied as a broadcast join + aggregation (rules tables are
tiny relative to frontiers, and the join never shuffles the frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlsql import base_domain_col


def apply_robots(df: DataFrame, robots: DataFrame | None,
                 url_col: str = "url", host_col: str = "host") -> DataFrame:
    """Adds `robots_ok` boolean. Rows of `df` must be unique (frontier rows
    are, by dedup construction)."""
    if robots is None:
        return df.withColumn("robots_ok", F.lit(True))
    cols = df.columns
    path = F.substring(F.col(url_col),
                       F.length(base_domain_col(F.col(url_col))) + 1, 1 << 30)
    path = F.when(path == "", "/").otherwise(path)
    match = F.col("rule").isNotNull() & F.col("_path").startswith(F.col("path_prefix"))
    plen = F.when(match, F.length("path_prefix"))
    verdict = (
        df.withColumn("_path", path)
        .join(F.broadcast(robots), on=host_col, how="left")
        .groupBy(*cols)
        .agg(
            F.max(plen).alias("_best"),
            F.max(F.when(match & (F.col("rule") == "disallow"),
                         F.length("path_prefix"))).alias("_dis_best"),
        )
    )
    # longest match wins; a disallow at the winning length beats an allow
    return (verdict.withColumn(
        "robots_ok",
        F.col("_best").isNull()
        | (F.coalesce(F.col("_dis_best"), F.lit(-1)) < F.col("_best")))
        .drop("_best", "_dis_best"))
