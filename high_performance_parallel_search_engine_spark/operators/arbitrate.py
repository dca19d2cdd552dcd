"""Intra-round enqueue arbitration: first-occurrence dedup interleaved with
the <=20-links-per-page cap (Serial Version/src/crawler.c:1299-1341).

The serial semantics are a sequential greedy over candidates in
(parent_seq, link_idx) order:

    for each fetched page, in fetch order:
        added = 0
        for each candidate link, in extraction order:
            if added >= 20: break            # added_urls < 20, c.c:1299
            if url already enqueued: skip    # has_visited, c.c:1320
            enqueue; mark seen; added += 1

The cap counts only ENQUEUED links, and a link dropped by the cap is NOT
marked seen - a later page may still enqueue the same URL ("revival"). That
interleaving is inherently sequential, but only over the round's slim
candidate tuples - all heavy work (fetch, parse, extract, canonicalize,
validity, cross-round anti-join) already ran distributed.

Two modes:

- exact: single-partition streaming greedy via mapInPandas over candidates
  sorted by (parent_seq, link_idx). State is one Python set of this round's
  NEW urls (prior rounds were already removed by the anti-join). Bounded by
  distinct new URLs per round; at reference parity scale (<=1000 frontier)
  this is trivially small, and even at 10^8 candidates/round it is a single
  linear pass over ~50 bytes/row.
- scale: fully distributed two-window approximation - first occurrence per
  url by (parent_seq, link_idx), then per-page rank <= cap over survivors.
  Identical to exact EXCEPT the revival quirk (a url whose first occurrence
  was capped out is dropped for the round instead of reviving from a later
  page). This is the 10^10-frontier default; parity tests use exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LINKS_PER_PAGE = 20


def arbitrate_exact(cands: DataFrame, cap: int = MAX_LINKS_PER_PAGE) -> DataFrame:
    """cands: (parent_seq, link_idx, url, ...). Returns kept rows."""
    def greedy(batches):
        import pandas as pd

        seen: set[str] = set()
        cur_page = None
        added = 0
        for pdf in batches:
            mask = []
            for ps, u in zip(pdf["parent_seq"], pdf["url"]):
                if ps != cur_page:
                    cur_page = ps
                    added = 0
                if added >= cap or u in seen:
                    mask.append(False)
                    continue
                seen.add(u)
                added += 1
                mask.append(True)
            yield pdf[pd.Series(mask, index=pdf.index)]

    slim = cands.repartition(1).sortWithinPartitions("parent_seq", "link_idx")
    return slim.mapInPandas(greedy, schema=cands.schema)


def arbitrate_scale(cands: DataFrame, cap: int = MAX_LINKS_PER_PAGE) -> DataFrame:
    """Distributed approximation: dedup-first-occurrence then per-page cap.
    Drops the serial 'revival' quirk (documented above)."""
    w_url = Window.partitionBy("url").orderBy("parent_seq", "link_idx")
    w_page = Window.partitionBy("parent_seq").orderBy("link_idx")
    return (
        cands.withColumn("_occ", F.row_number().over(w_url))
        .where(F.col("_occ") == 1)
        .withColumn("_rank", F.row_number().over(w_page))
        .where(F.col("_rank") <= cap)
        .drop("_occ", "_rank")
    )


def openmp_queue_positions(children: DataFrame,
                           score_col: str = "_score") -> DataFrame:
    """OpenMP combined insertion policy (OpenMP Version/src/
    crawler.c:701-731) over one round's children: returns the input plus a
    `_qpos` long column = each row's final position in the insertion queue.

    Like arbitrate_exact this is the sequential-greedy idiom: a single
    linear pass over the round's slim child tuples sorted by discovery
    order (parent_seq, link_idx), buffered because positions are only known
    once the queue is complete. Opt-in via CrawlConfig(priority='openmp');
    the scale modes use pure sort keys instead."""
    from ..kernel.urls import openmp_insertion_order

    def assign(batches):
        import pandas as pd

        frames = [f for f in batches]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        order = openmp_insertion_order(
            list(zip((int(s) for s in pdf[score_col]), range(len(pdf)))))
        pos = [0] * len(pdf)
        for qpos, idx in enumerate(order):
            pos[idx] = qpos
        pdf["_qpos"] = pos
        yield pdf

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType(list(children.schema.fields)
                        + [StructField("_qpos", LongType())])
    slim = children.repartition(1).sortWithinPartitions(
        "parent_seq", "link_idx")
    return slim.mapInPandas(assign, schema=schema)


def arbitrate(cands: DataFrame, cap: int = MAX_LINKS_PER_PAGE,
              mode: str = "exact", exact_threshold: int = 5_000_000,
              count_hint: int | None = None) -> DataFrame:
    """mode: 'exact' | 'scale' | 'auto' (exact below threshold rows).

    auto uses count_hint when the caller already knows the approximate
    candidate volume (run_round passes pages_ok x a links-per-page bound) so
    the switch costs no extra job; without a hint it counts cands (one pass
    over slim tuples). Note auto is a *semantics* switch at the threshold:
    scale mode drops the serial revival quirk (docstring above) - crawls that
    must be event-exact pin mode='exact'.
    """
    if mode == "auto":
        n = count_hint if count_hint is not None else cands.count()
        mode = "exact" if n <= exact_threshold else "scale"
    if mode == "exact":
        return arbitrate_exact(cands, cap)
    if mode == "scale":
        return arbitrate_scale(cands, cap)
    raise ValueError(mode)
