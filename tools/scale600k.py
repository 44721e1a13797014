"""One-off round-6 scale point: 600k-page full-pipeline run at local[2]
vs local[8] (same seed/shards discipline as tools/scaling_bench.py).

Extends the BENCH/BASELINE.md amortization table (60k/150k/300k) with a
fourth row to confirm-or-refute the Amdahl plateau above 300k. Prints one
JSON line per level; the builder appends the row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_bench import run_at  # noqa: E402
from ocr_processing_pipeline_spark.sources.corpus import ensure_corpus  # noqa: E402


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    corpus_dir = os.path.join(REPO, ".cache", f"pages_bench_{pages}_sharded")
    t0 = time.time()
    paths = ensure_corpus(corpus_dir, pages, shards=128)
    print(f"corpus ready in {time.time() - t0:.1f}s", flush=True)

    results = {}
    for cpus in (2, 8):
        t0 = time.time()
        results[cpus] = run_at(cpus, paths["pages"], corpus_dir, full=True)
        results[cpus]["wall_sec"] = round(time.time() - t0, 1)
        print(json.dumps(results[cpus]), flush=True)

    speedup = results[8]["docs_per_sec"] / results[2]["docs_per_sec"]
    print(json.dumps({
        "pages": pages,
        "speedup": round(speedup, 2),
        "efficiency": round(speedup / 4, 2),
        "counts_identical": (
            results[2]["chunks"] == results[8]["chunks"]
            and results[2]["edges"] == results[8]["edges"]),
    }), flush=True)


if __name__ == "__main__":
    main()
