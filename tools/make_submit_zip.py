"""Package the engine for spark-submit --py-files.

Zips the pure-Python package into dist/hppse.zip (no native deps - every
executor can import it from the zip directly) and prints the submit command.

    python tools/make_submit_zip.py [outdir]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "high_performance_parallel_search_engine_spark"


def build_zip(outdir: str = "dist") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, outdir), exist_ok=True)
    out = os.path.join(root, outdir, "hppse.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    zf.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    path = build_zip(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(f"built {path}")
    print("submit with:\n"
          f"  spark-submit --master <cluster> --py-files {path} "
          "tools/submit_crawl.py -c URL -d 3 -p 100000 --no-clamp "
          "--pages-table <parquet> --workdir <dir>")
