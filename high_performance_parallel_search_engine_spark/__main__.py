"""CLI entrypoint mirroring the reference's job-submission contract.

Reference: ``./bin/search_engine -c URL -d DEPTH -p PAGES`` (Serial
Version/src/main.c:53-149; dashboard shell-out WebSite/api.py:106-120 adds
``-t THREADS`` for OpenMP and ``-q QUERY``). This engine is an offline batch
crawler over Common-Crawl-style page tables instead of a live HTTP client,
so the page source is an input: ``--pages`` points at a parquet of
(url, warc_ts, html, lang); without it a deterministic synthetic web is
generated (sources/synth.py), which is also what every test crawls.

Flag semantics kept from main.c:
  -d clamps to 1..5 with the same warning (main.c:102-114)
  -p clamps to 1..100 with the same warning (main.c:115-127)
  -c on a medium.com/@ profile raises max_pages to >=20 (main.c:75-85)
  -m USER crawls https://medium.com/@USER at depth 3, 25 pages
     (main.c:119-139)
  -t N sets parallelism (OpenMP -t; here the local[N] master / shuffle
     partitions)
  -q QUERY runs one BM25 query over the crawl's extracted text and prints
     the top-10 (the reference enters an interactive prompt; one-shot here)

Usage examples:
  python -m high_performance_parallel_search_engine_spark -c https://host0.example.com/p/0/0 -d 3 -p 20
  python -m high_performance_parallel_search_engine_spark -m user0 -q "spark join" --workdir /tmp/crawl
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m high_performance_parallel_search_engine_spark",
        description="PySpark-native crawl + BM25 search "
                    "(reference contract: -c URL -d DEPTH -p PAGES)")
    ap.add_argument("-c", "--crawl", metavar="URL",
                    help="crawl starting from URL")
    ap.add_argument("-m", "--medium", metavar="USER",
                    help="crawl the Medium profile USER (implies -d 3 -p 25)")
    ap.add_argument("-d", "--depth", type=int, default=2,
                    help="maximum crawl depth (default 2, clamped 1..5)")
    ap.add_argument("-p", "--pages", type=int, default=10, dest="max_pages",
                    help="maximum pages to crawl (default 10, clamped 1..100"
                         " unless --no-clamp)")
    ap.add_argument("-t", "--threads", type=int, default=None,
                    help="parallelism (local[N] master + shuffle partitions)")
    ap.add_argument("-q", "--query", help="BM25 query to run after the crawl")
    src = ap.add_mutually_exclusive_group()
    src.add_argument("--pages-table", metavar="PARQUET",
                     help="parquet of (url, warc_ts, html, lang) to crawl "
                          "over; default: deterministic synthetic web")
    src.add_argument("--pages-warc", metavar="DIR",
                     help="directory of .warc.gz files (Common Crawl "
                          "layout) to crawl over: records are parsed once "
                          "into a bucketed parquet pages table under "
                          "--workdir, then crawled with bucket pruning "
                          "(sources/warc.py); a --resume/--resume-from run "
                          "reuses the staged table instead of re-parsing")
    ap.add_argument("--workdir", help="checkpoint dir (default: temp dir)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the last committed round in --workdir")
    ap.add_argument("--priority", choices=["fifo", "north", "openmp"],
                    default="fifo", help="frontier scheduling mode")
    ap.add_argument("--budget", action="append", default=[],
                    metavar="HOST=N",
                    help="per-host politeness budget (fetches/round); "
                         "repeatable; use *=N for the default budget")
    rb = ap.add_mutually_exclusive_group()
    rb.add_argument("--robots-table", metavar="PARQUET",
                    help="parquet of (host, robots_txt) bodies; parsed "
                         "distributed into allow/disallow prefix rules")
    rb.add_argument("--robots-warc", metavar="DIR",
                    help="directory of .warc.gz robots.txt captures "
                         "(Common Crawl robotstxt layout); response "
                         "records for */robots.txt become the "
                         "(host, robots_txt) table, then the same "
                         "distributed rule parse as --robots-table")
    ap.add_argument("--resume-from", type=int, default=None, metavar="R",
                    help="rewind to round R's snapshot and replay from there")
    ap.add_argument("--overwrite", action="store_true",
                    help="allow a fresh crawl to DISCARD committed round "
                         "snapshots already in --workdir (without this, a "
                         "fresh crawl into a used workdir refuses to run "
                         "so a forgotten --resume cannot destroy them)")
    ap.add_argument("--no-clamp", action="store_true",
                    help="drop the reference's 100-page / depth-5 clamps "
                         "(scale mode)")
    ap.add_argument("-i", "--interactive", action="store_true",
                    help="after the crawl, loop a query prompt over the "
                         "warm index (the reference's interactive mode, "
                         "main.c:172-184); EOF or 'exit' quits")
    ap.add_argument("--export-warc", metavar="DIR",
                    help="after the crawl, export the fetched pages "
                         "(url, warc_ts, html, lang) as Common-Crawl-"
                         "layout .warc.gz archives under DIR - the "
                         "interchange inverse of --pages-warc")
    ap.add_argument("--publish-index", metavar="DIR",
                    help="after the crawl, publish the index as a term-"
                         "bucketed serving store at DIR (postings + doc "
                         "stats + url map; queries against it read only "
                         "the buckets their terms hash to)")
    ap.add_argument("--index-store", metavar="DIR",
                    help="serve-only mode: answer -q / -i from a store "
                         "published with --publish-index, without "
                         "crawling (cannot be combined with -c/-m)")
    ap.add_argument("--save-baseline", metavar="CSV",
                    help="save this run's phase timings as the baseline "
                         "metrics CSV (benchmark.c save_as_baseline)")
    ap.add_argument("--compare-baseline", metavar="CSV",
                    help="load a baseline metrics CSV and print per-phase "
                         "speedup vs it (benchmark.c calculate_speedup)")
    return ap


# flags whose values are overridden by the persisted manifest config on
# --resume/--resume-from (run_crawl reloads cfg from the manifest)
_RESUME_IGNORED = [("depth", 2, "-d"), ("max_pages", 10, "-p"),
                   ("priority", "fifo", "--priority"), ("budget", [], "--budget"),
                   ("robots_table", None, "--robots-table"),
                   ("robots_warc", None, "--robots-warc")]


def _warn_resume_overrides(args) -> None:
    if not (args.resume or args.resume_from is not None):
        return
    for attr, default, flag in _RESUME_IGNORED:
        if getattr(args, attr) != default:
            print(f"Warning: {flag} is ignored with --resume/--resume-from "
                  "(the persisted manifest config wins)")


def _clamped_limits(args) -> tuple[int, int]:
    depth, pages = args.depth, args.max_pages
    if depth < 1:
        depth = 1
    if depth > 5 and not args.no_clamp:
        print("Warning: High crawl depth may take a long time. "
              "Limited to 5.")
        depth = 5
    if pages < 1:
        pages = 1
    if pages > 100 and not args.no_clamp:
        print("Warning: High page limit may take a long time. "
              "Limited to 100.")
        pages = 100
    return depth, pages


def _print_hits(entries) -> None:
    """Ranked-result lines shared by every CLI serving path; entries are
    (doc_id, score, url) tuples."""
    entries = list(entries)
    for rank, (d, s, u) in enumerate(entries, 1):
        print(f"{rank:2d}. doc {d} score={s:.4f} {u}")
    if not entries:
        print("No results.")


def _interactive_loop(run_query) -> float:
    """The reference's query prompt (main.c:172-184); EOF or 'exit'
    quits. Returns the last query's wall in ms (0.0 if none ran)."""
    print("Search engine ready for queries.")
    last = 0.0
    while True:
        try:
            q = input("Enter your search query: ").strip()
        except EOFError:
            break
        if not q or q.lower() in ("exit", "quit"):
            break
        print(f"\nSearching for: {q}")
        last = run_query(q)
    return last


def _serve_from_store(args, spark=None) -> int:
    """Serve-only mode: -q / -i answered straight from a published
    term-bucketed store directory (no crawl, no source corpus). The BM25
    plan is the store's whole point: candidate terms prune the scan to
    their buckets, df comes from the exchange-free (term, df) table."""
    from pyspark.sql import functions as F

    from .operators.index import avg_doc_len, term_df
    from .operators.index_store import open_store
    from .operators.ranking import interactive_query_conf, rank_bm25
    from .session import build_session

    if spark is None:
        master = f"local[{args.threads}]" if args.threads else None
        spark = build_session("hppse-cli", master=master,
                              shuffle_partitions=args.threads)
    tbl, stats, doc_map = open_store(spark, args.index_store,
                                     table="cli_postings_store")
    total = stats.count()
    avg_dl = avg_doc_len(stats, total)
    dfs = term_df(tbl).cache()
    dfs.count()
    print(f"Serving published index from {args.index_store}: "
          f"{total} documents.")

    def run_query(q: str) -> float:
        from .operators.phrase import as_quoted_phrase

        if as_quoted_phrase(q) is not None:
            # the API's store-backed server 400s this for the same reason
            print("Error: phrase search needs a crawl workdir (the "
                  "published store has no positions)")
            return 0.0
        t0 = time.perf_counter()
        with interactive_query_conf(spark):
            top = rank_bm25(tbl, stats, q, total_docs=total, avg_dl=avg_dl,
                            top_k=10, fallback=True, df_table=dfs).collect()
        ms = (time.perf_counter() - t0) * 1000
        urls = {}
        if doc_map is not None and top:
            urls = {r["doc_id"]: r["url"] for r in
                    doc_map.where(F.col("doc_id").isin(
                        [r["doc_id"] for r in top])).collect()}
        print(f"Query processed in {ms:.2f} ms")
        _print_hits((r["doc_id"], r["score"], urls.get(r["doc_id"], ""))
                    for r in top)
        return ms

    if args.query:
        print(f"\nSearching for: {args.query}")
        run_query(args.query)
    if args.interactive:
        _interactive_loop(run_query)
    return 0


def main(argv: list[str] | None = None, spark=None) -> int:
    """`spark=None` builds a local session; pass an existing session to run
    under spark-submit (tools/submit_crawl.py does this so the cluster
    master/conf from spark-submit is inherited, not overridden)."""
    args = build_parser().parse_args(argv)
    if args.index_store:
        if args.crawl or args.medium:
            print("Error: --index-store is serve-only; it cannot be "
                  "combined with -c/-m (publish at crawl time with "
                  "--publish-index)")
            return 2
        if not (args.query or args.interactive):
            print("Error: --index-store is serve-only; pass -q QUERY "
                  "and/or -i")
            return 2
        ignored = [flag for flag, val in
                   (("--workdir", args.workdir),
                    ("--save-baseline", args.save_baseline),
                    ("--compare-baseline", args.compare_baseline),
                    ("--resume", args.resume),
                    ("--resume-from", args.resume_from is not None),
                    ("--overwrite", args.overwrite),
                    ("--export-warc", args.export_warc),
                    ("--pages-table", args.pages_table),
                    ("--pages-warc", args.pages_warc),
                    ("--robots-table", args.robots_table),
                    ("--robots-warc", args.robots_warc),
                    ("--budget", args.budget),
                    ("--publish-index", args.publish_index))
                   if val]
        if ignored:
            print(f"Warning: {', '.join(ignored)} ignored in "
                  f"--index-store mode")
        return _serve_from_store(args, spark)
    if not (args.crawl or args.medium):
        build_parser().print_help()
        return 0

    from pyspark.sql import functions as F

    from .baseline import load_baseline, save_baseline, speedup_report
    from .operators.crawl import CrawlConfig, run_crawl
    from .operators.index import build_doc_stats, build_postings
    from .operators.ranking import rank_bm25
    from .session import build_session
    from .sources.synth import build_corpus_df

    depth, max_pages = _clamped_limits(args)
    if args.medium:
        user = args.medium if args.medium.startswith("@") else "@" + args.medium
        start_url = f"https://medium.com/{user}"
        depth, max_pages = 3, 25
        print(f"Crawling Medium profile: {start_url}")
    else:
        start_url = args.crawl
        if "medium.com/@" in start_url and max_pages < 20:
            max_pages = 20  # main.c:80-84
            print("Medium profile detected. "
                  f"Will crawl up to {max_pages} pages.")
        print(f"Starting website crawl from URL: {start_url}")

    if spark is None:
        master = f"local[{args.threads}]" if args.threads else None
        spark = build_session("hppse-cli", master=master,
                              shuffle_partitions=args.threads)
    workdir = args.workdir or tempfile.mkdtemp(prefix="hppse-crawl-")
    resuming = args.resume or args.resume_from is not None
    pages_buckets = None
    if args.pages_table:
        pages = spark.read.parquet(args.pages_table) \
            .select("url", "warc_ts", "html", "lang")
    elif args.pages_warc:
        # parse the archives ONCE into a bucketed parquet table (a crawl
        # scans its pages table every round; re-inflating gzip per round
        # would multiply the decode cost by the round count), then crawl
        # with bucket pruning - the same WARC -> bucketed-parquet -> crawl
        # composition SCALING.md documents for the 100 TB path. A resumed
        # run reuses the table staged by the interrupted run: re-ingesting
        # the full archive set would make resume cost O(ingest) every time.
        import os

        from .sources.tables import (
            BUCKETING_META,
            read_bucketed_pages,
            write_bucketed_pages,
        )
        from .sources.warc import read_warc_gz

        import json as _json

        staged = f"{workdir}/_pages_from_warc.parquet"
        src_marker = f"{staged}/_source.json"
        # reuse requires the COMPLETED staging (the bucketing sidecar is
        # written last - a mid-ingest kill leaves a partial directory that
        # must be re-staged, not "reused" into a FileNotFoundError) AND
        # the SAME source directory (a resume pointed at a different
        # archive dir must not silently crawl the stale staged corpus)
        src_now = os.path.abspath(args.pages_warc)
        staged_src = None
        if os.path.isfile(src_marker):
            staged_src = _json.load(open(src_marker)).get("pages_warc")
        if (resuming and os.path.isfile(f"{staged}/{BUCKETING_META}")
                and staged_src == src_now):
            print(f"Reusing staged WARC pages table: {staged}")
        else:
            if resuming and staged_src is not None and staged_src != src_now:
                print(f"Warning: staged pages table came from {staged_src}; "
                      f"re-staging from {src_now}")
            write_bucketed_pages(read_warc_gz(spark, args.pages_warc),
                                 staged, n_buckets=16)
            with open(src_marker, "w") as fh:
                _json.dump({"pages_warc": src_now}, fh)
            print(f"Parsed WARC archives from {args.pages_warc} "
                  f"-> {staged} (16 buckets)")
        pages, pages_buckets = read_bucketed_pages(spark, staged)
    else:
        pages = build_corpus_df(spark).select("url", "warc_ts", "html", "lang")
    priority = {"fifo": False, "north": True, "openmp": "openmp"}[args.priority]
    politeness = None
    if args.budget:
        politeness = {}
        for spec in args.budget:
            host, _, n = spec.partition("=")
            politeness[host] = int(n)
    robots = None
    # on resume the manifest config wins (run_crawl reloads it), so the
    # robots archive parse + rules collect would be paid and thrown away
    if (args.robots_table or args.robots_warc) and not resuming:
        from .operators.robots import robots_rules_from_df

        if args.robots_table:
            bodies = spark.read.parquet(args.robots_table)
        else:
            from .sources.warc import robots_df_from_warc

            bodies = robots_df_from_warc(spark, args.robots_warc)
        robots = [(r["host"], r["rule"], r["path_prefix"]) for r in
                  robots_rules_from_df(bodies).collect()]
    cfg = CrawlConfig(max_depth=depth, max_pages=max_pages,
                      priority=priority, politeness=politeness,
                      robots=robots, pages_buckets=pages_buckets)
    _warn_resume_overrides(args)
    t0 = time.perf_counter()
    try:
        state = run_crawl(spark, pages, [start_url], workdir, cfg,
                          resume=args.resume, resume_from=args.resume_from,
                          overwrite=args.overwrite)
    except ValueError as e:
        if "committed crawl round" in str(e):
            print(f"Error: {e}")
            print("Hint: pass --resume to continue, --resume-from R to "
                  "rewind, or --overwrite to discard the checkpoints.")
            return 2
        raise
    wall = time.perf_counter() - t0
    if state.pages_crawled > 0:
        print(f"Successfully crawled {state.pages_crawled} pages "
              f"from {start_url}")
    else:
        print("Failed to crawl website from URL")
        return 1
    print(f"Crawl checkpoints: {workdir} "
          f"(rounds={state.round}, wall={wall:.2f}s, "
          f"stop={state.stopped or 'frontier_empty'})")

    if args.export_warc:
        # re-emit the FETCHED subset as Common-Crawl-layout archives: the
        # round snapshots store extracted text, so the original html bytes
        # come from an id-only join back against the source pages table
        from .sources.warc import write_warc_gz

        crawled = (spark.read.parquet(f"{workdir}/round=*/pages.parquet")
                   .select("url").distinct())
        subset = pages.join(crawled, "url") \
            .select("url", "warc_ts", "html", "lang")
        nf = write_warc_gz(subset, args.export_warc)
        print(f"Exported {state.pages_crawled} pages as {nf} .warc.gz "
              f"file(s) to {args.export_warc}")

    phase_ms = {"CrawlingTime_ms": wall * 1000}
    last_query_ms = 0.0
    if (args.query or args.interactive or args.save_baseline
            or args.publish_index):
        docs = (spark.read.parquet(f"{workdir}/round=*/pages.parquet")
                .select(F.col("seq").alias("doc_id"), "url", "text"))
        from .operators.index import avg_doc_len, term_df, term_df_map

        t1 = time.perf_counter()
        postings = build_postings(docs).cache()
        stats = build_doc_stats(docs).cache()
        total = stats.count()
        avg_dl = avg_doc_len(stats, total)
        n_postings = postings.count()  # warm the cache; queries reuse it
        dfs = term_df(postings).cache()
        # driver-side {term: df} while the vocab fits (shared contract:
        # operators.index.term_df_map): each interactive query is then
        # ONE Spark job
        df_map = term_df_map(dfs)
        # the reference's prompt loop serves from its in-process index
        # (main.c:172-184); when the index fits the collect caps, do the
        # same (the gate-then-build sequence is shared with the dashboard:
        # operators.local_serve.build_local_serving) - a query then costs
        # microseconds instead of a Spark job. Past either cap, or when no
        # query will run (--save-baseline alone): the distributed path.
        local_ix = url_map = None
        if args.query or args.interactive:
            from .operators.local_serve import build_local_serving

            local_ix, url_map = build_local_serving(
                postings, stats, docs.select("doc_id", "url"),
                total_docs=total, avg_dl=avg_dl, n_postings=n_postings)
        phase_ms["IndexingTime_ms"] = (time.perf_counter() - t1) * 1000
        print(f"Indexed {total} documents.")

        if args.publish_index:
            # a CLI crawl is clamped to <=100 pages, so 16 buckets keeps
            # bucket files non-trivial; a production publish sizes B to
            # the cluster (index_store.save_postings_bucketed docstring)
            from .operators.index_store import publish_store

            publish_store(postings, args.publish_index,
                          table="cli_postings_store", buckets=16,
                          doc_map=docs.select("doc_id", "url"))
            print(f"Published bucketed index store to {args.publish_index}")

        pos_holder: list = []  # lazy positional index for phrase queries

        def run_query(q: str) -> float:
            from .operators.ranking import interactive_query_conf

            from .operators.phrase import as_quoted_phrase

            phrase = as_quoted_phrase(q)
            if phrase is not None:
                # quoted query -> exact phrase match over the lazily-built
                # positional index (built once, reused by later phrases)
                from .operators.phrase import (build_positional_postings,
                                               phrase_terms,
                                               rank_bm25_phrase)

                if not phrase_terms(phrase):
                    print("Error: phrase has no indexable terms")
                    return 0.0
                if not pos_holder:
                    pos_holder.append(build_positional_postings(
                        docs.select("doc_id", "text")).cache())
                    pos_holder[0].count()
                t2 = time.perf_counter()
                with interactive_query_conf(spark):
                    top = rank_bm25_phrase(
                        pos_holder[0], stats, phrase, total_docs=total,
                        avg_dl=avg_dl, top_k=10).collect()
                    by_id = {r["doc_id"]: r["url"]
                             for r in docs.where(F.col("doc_id").isin(
                                 [r["doc_id"] for r in top] or [-1]))
                             .select("doc_id", "url").collect()}
                ms = (time.perf_counter() - t2) * 1000
                print(f"Query processed in {ms:.2f} ms")
                _print_hits((r["doc_id"], r["score"],
                             by_id.get(r["doc_id"], "")) for r in top)
                return ms

            if local_ix is not None:
                t2 = time.perf_counter()
                hits = local_ix.rank(q, top_k=10, fallback=True)
                ms = (time.perf_counter() - t2) * 1000
                print(f"Query processed in {ms:.2f} ms")
                _print_hits((d, s, url_map.get(d, "")) for d, s in hits)
                return ms

            t2 = time.perf_counter()
            with interactive_query_conf(spark):
                top = rank_bm25(postings, stats, q, total_docs=total,
                                avg_dl=avg_dl, top_k=10, fallback=True,
                                df_table=None if df_map is not None else dfs,
                                df_map=df_map).collect()
            ms = (time.perf_counter() - t2) * 1000
            by_id = {r["doc_id"]: r["url"]
                     for r in docs.where(F.col("doc_id").isin(
                         [r["doc_id"] for r in top] or [-1]))
                     .select("doc_id", "url").collect()}
            print(f"Query processed in {ms:.2f} ms")
            _print_hits((r["doc_id"], r["score"],
                         by_id.get(r["doc_id"], "")) for r in top)
            return ms

        if args.query:
            print(f"\nSearching for: {args.query}")
            last_query_ms = run_query(args.query)
        if args.interactive:
            ms = _interactive_loop(run_query)
            if ms:
                last_query_ms = ms
    if last_query_ms:
        phase_ms["QueryProcessingTime_ms"] = last_query_ms
    phase_ms["TotalExecutionTime_ms"] = (time.perf_counter() - t0) * 1000

    if args.compare_baseline:
        base = load_baseline(args.compare_baseline)
        for line in speedup_report(base, phase_ms):
            print(line)
    if args.save_baseline:
        save_baseline(args.save_baseline, phase_ms)
        print(f"Metrics saved to {args.save_baseline}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
