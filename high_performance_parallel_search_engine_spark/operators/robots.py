"""Robots rules (north_rule requirement; the reference only DOCUMENTS robots
compliance - Serial Version/docs/architecture.md:26 - and implements none, so
these semantics are ours, specified in kernel/bfs.py:robots_allowed).

Rules table: (host, rule 'allow'|'disallow', path_prefix). Longest matching
prefix wins; equal-length tie -> disallow; no matching rule / no rules for
host -> allow. Applied as a broadcast join + aggregation (rules tables are
tiny relative to frontiers, and the join never shuffles the frontier).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlsql import base_domain_col


def parse_robots_txt(host: str, text: str,
                     agent: str = "*") -> list[tuple[str, str, str]]:
    """Parse a robots.txt body into our (host, rule, path_prefix) tuples.

    Standard group semantics: rules apply from every `User-agent:` group
    whose agent token is `*` or equals `agent` (case-insensitive);
    `Allow:`/`Disallow:` lines outside any group are ignored; comments
    (#...) and blank lines stripped; `Disallow:` with an empty path is the
    spec's allow-all and contributes no rule (our no-match default is
    already allow). Unknown directives (Crawl-delay, Sitemap) are skipped.
    """
    rules: list[tuple[str, str, str]] = []
    active = False
    in_group_header = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # consecutive user-agent lines open ONE group matching any of them
            if not in_group_header:
                active = False
            in_group_header = True
            if val == "*" or val.lower() == agent.lower():
                active = True
            continue
        in_group_header = False
        if key in ("allow", "disallow") and active and val:
            rules.append((host, key, val))
    return rules


def robots_rules_from_df(robots_txt: DataFrame, agent: str = "*",
                         host_col: str = "host",
                         text_col: str = "robots_txt") -> DataFrame:
    """Distributed robots.txt ingestion: (host, robots_txt) -> exploded
    (host, rule, path_prefix) rules table via one Arrow pass - at 10^7 hosts
    the parse runs where the bodies live and only the tiny rules table
    returns. Feed the result to apply_robots / CrawlConfig.robots."""
    from pyspark.sql.types import (
        ArrayType, StringType, StructField, StructType,
    )

    out_t = ArrayType(StructType([StructField("rule", StringType()),
                                  StructField("path_prefix", StringType())]))

    @F.pandas_udf(out_t)
    def parse_udf(host: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series([
            [(r, p) for _h, r, p in parse_robots_txt(h or "", t or "",
                                                     agent=agent)]
            for h, t in zip(host, text)])

    return (robots_txt
            .select(F.col(host_col).alias("host"),
                    F.explode(parse_udf(F.col(host_col), F.col(text_col)))
                    .alias("_r"))
            .select("host", F.col("_r.rule").alias("rule"),
                    F.col("_r.path_prefix").alias("path_prefix")))


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
