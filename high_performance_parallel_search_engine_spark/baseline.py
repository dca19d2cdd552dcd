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


def speedup_report(baseline: dict[str, float],
                   current: dict[str, float]) -> list[str]:
    """calculate_speedup's printout (benchmark.c:52-100): per-metric
    current vs baseline with the ratio; returns the printable lines."""
    lines = ["=========== PERFORMANCE SPEEDUP METRICS ==========="]
    for name, cur in current.items():
        base = baseline.get(name)
        if base is None or cur <= 0:
            continue
        label = name.removesuffix("_ms").removesuffix("Time") + ":"
        lines.append(f"{label:<14}{cur:.2f} ms  (Baseline: {base:.2f} ms)"
                     f"  Speedup: {base / cur:.2f}x")
    lines.append("===================================================")
    return lines
