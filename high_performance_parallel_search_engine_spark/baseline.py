"""Baseline metrics persistence + speedup report.

Port of the reference's benchmark bookkeeping (Serial Version/src/
benchmark.c:10-141 and the `Metric,Value` CSV writer of src/metrics.c:
96-135): a run can be saved as the baseline file, and later runs load it
and print per-phase speedup ratios. The CSV format is kept byte-compatible
(`Metric,Value` header, `<Name>_ms,<%.2f>` rows) so a file written here
reads the same way the C's sscanf loop does.
"""

from __future__ import annotations

from pathlib import Path

# benchmark.c:15-19 - the defaults used when the baseline file is missing
DEFAULT_BASELINE = {
    "CrawlingTime_ms": 1000.0,
    "ParsingTime_ms": 200.0,
    "TokenizingTime_ms": 300.0,
    "IndexingTime_ms": 500.0,
    "QueryProcessingTime_ms": 50.0,
}


def save_baseline(path: str, metrics: dict[str, float]) -> None:
    """save_as_baseline / save_metrics_to_csv analog: `Metric,Value` CSV."""
    lines = ["Metric,Value"]
    for k, v in metrics.items():
        lines.append(f"{k},{float(v):.2f}")
    Path(path).write_text("\n".join(lines) + "\n")


def load_baseline(path: str) -> dict[str, float]:
    """init_baseline_metrics analog: parse the CSV; fall back to the
    benchmark.c default values (with the same warning) when absent."""
    p = Path(path)
    if not p.exists():
        print(f"Warning: Could not open baseline metrics file {path}")
        return dict(DEFAULT_BASELINE)
    out: dict[str, float] = {}
    for line in p.read_text().splitlines()[1:]:  # skip header
        name, _, val = line.partition(",")
        try:
            out[name] = float(val)
        except ValueError:
            continue
    return out


# calculate_speedup's fixed printout set (benchmark.c:77-90): metric CSV
# name -> printed label. Crawling prints only when the current value is > 0;
# the other four lines ALWAYS print (speedup 0.00x when current is 0).
_REPORT_LINES = [
    ("CrawlingTime_ms", "Crawling:"),
    ("ParsingTime_ms", "Parsing:"),
    ("TokenizingTime_ms", "Tokenizing:"),
    ("IndexingTime_ms", "Indexing:"),
    ("QueryProcessingTime_ms", "Query:"),
]


def speedup_report(baseline: dict[str, float],
                   current: dict[str, float]) -> list[str]:
    """calculate_speedup's printout (benchmark.c:52-100), line-faithful:
    the five fixed phase lines with the C's labels ('Query:', not
    'QueryProcessing:'), Crawling skipped only when its current time is 0,
    the rest always emitted, speedup 0 when current is 0."""
    lines = ["=========== PERFORMANCE SPEEDUP METRICS ==========="]
    for name, label in _REPORT_LINES:
        cur = float(current.get(name, 0.0) or 0.0)
        base = float(baseline.get(name, 0.0) or 0.0)
        if name == "CrawlingTime_ms" and cur <= 0:
            continue
        ratio = base / cur if cur > 0 else 0.0
        lines.append(f"{label:<14}{cur:.2f} ms  (Baseline: {base:.2f} ms)"
                     f"  Speedup: {ratio:.2f}x")
    lines.append("===================================================")
    return lines
