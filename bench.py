"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints the full per-query JSON line, then a
<1 KB summary JSON line LAST (the driver tail-captures ~2 KB and parses
the final line).

Times every registered query (plans/queries.py) by executing its full plan
with the no-op sink (no driver collect), plus the flagship extraction
pipeline over the synthetic pages corpus; reports per-query seconds, total,
and extraction docs/s (the BASELINE.md headline — reference: 0.062 docs/s
sequential, Test_Logs/emissions_per_doc.csv).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_processing_pipeline_spark.plans.queries import (  # noqa: E402
    QUERIES, pages_corpus_dir)
from ocr_processing_pipeline_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_label = os.path.basename(os.path.normpath(sf_dir))

    spark = get_spark("bench", cpus=cpus)
    # warm the JVM + the synthetic corpus cache + the materialized
    # docs/chunks tables before timing (extraction cost is measured by
    # the pipeline_* queries themselves; the search queries should read
    # the materialized tables, not re-pay materialization)
    corpus = pages_corpus_dir(sf_dir)
    n_pages = spark.read.parquet(
        os.path.join(corpus, "pages.parquet")).count()
    from ocr_processing_pipeline_spark.plans.queries import (
        dedup_decisions_dir, dedup_index_dir, dedup_verdicts_dir,
        extracted_tables_dir, snapshot_decisions_dir)
    extracted_tables_dir(spark, sf_dir)
    # same for the dedup decisions table: deciding duplicates is timed by
    # dedup_components itself; curated_corpus times the curation READ path
    dedup_decisions_dir(spark, sf_dir)
    # and the snapshot-N dedup index + verdicts: dedup_incremental times
    # the PROBE path (the incremental architecture's point), not the
    # once-per-snapshot index build; snapshot_ingest times the
    # admission READ path
    dedup_index_dir(spark, sf_dir)
    dedup_verdicts_dir(spark, sf_dir)
    snapshot_decisions_dir(spark, sf_dir)

    # Sampling shape: min over (SWEEPS time-separated visits) x (RUNS
    # back-to-back runs per visit). Two failure modes pull in opposite
    # directions and this covers both:
    # - pure back-to-back best-of-3 (r1-r4): a multi-minute host-
    #   contention window swallows ALL of a query's samples — r4's
    #   driver artifact showed a fake 45x string_functions "regression"
    #   (5.4s vs 0.29s isolated) because one window covered a whole
    #   contiguous alphabetical block. Time-separated sweeps fix that:
    #   a window must span the entire run to poison a min.
    # - pure interleaving (1 run per visit): ~80 queries pass between a
    #   query's samples, Python workers get recycled, and every sample
    #   of worker-state-dependent queries is COLD (pipeline_edges read
    #   5.0s in-bench vs 1.0-1.2s warm isolated — the NER worker-
    #   lifetime memo never survives a sweep). Back-to-back pairs per
    #   visit restore the warm-state signal.
    sweeps = int(os.environ.get("SPARK_GRAFT_BENCH_SWEEPS", "2"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    import gc
    names = sorted(QUERIES)
    for _sweep in range(sweeps):
        for name in names:
            for _rep in range(n_runs):
                t0 = time.time()
                _run(QUERIES[name].fn(spark, sf_dir))
                dt = time.time() - t0
                prev = timings.get(name)
                timings[name] = round(
                    dt if prev is None else min(prev, dt), 3)
            # drop py4j refs to this query's DataFrames so ContextCleaner
            # can release its localCheckpointed RDDs — otherwise the
            # storage of ~10 checkpoint-using queries accumulates across
            # the run and late-alphabet queries time under GC/memory
            # pressure (observed: pivot/rollup 4-5x their fresh-JVM
            # times before this)
            gc.collect()

    # headline extraction throughput from a dedicated multi-rep loop:
    # one sf0.1 pass is sub-second on 32 threads, so a single-run
    # denominator swings 2x on host noise
    from ocr_processing_pipeline_spark.pipeline.extract import extract_docs
    pages_df = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    reps = int(os.environ.get("SPARK_GRAFT_EXTRACT_REPS", "5"))
    _run(extract_docs(pages_df).drop("spans"))        # warm
    t0 = time.time()
    for _ in range(reps):
        _run(extract_docs(pages_df).drop("spans"))
    extract_sec = (time.time() - t0) / reps
    docs_per_sec = round(n_pages / extract_sec, 2)

    total = round(sum(timings.values()), 3)
    # Output contract (VERDICT r5 #4): the round driver captures only a
    # ~2 KB stdout TAIL and json-parses the last line — a single JSON
    # line with the full 85-query map exceeds the window and every
    # round's BENCH artifact shipped parsed:null with the head queries
    # truncated. So: the full per-query map (2-decimal) goes on the
    # PENULTIMATE line, and the LAST line is a <1 KB summary (total,
    # n_queries, docs/s, the slowest queries inline) that always fits
    # and always parses.
    timings2 = {k: round(v, 2) for k, v in timings.items()}
    print(json.dumps({"queries_full": timings2},
                     separators=(",", ":")))
    slowest = dict(sorted(timings2.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf_label,
        "cpus": cpus,
        "n_queries": len(timings),
        "runs_per_query": sweeps * n_runs,
        "agg": "min_over_sweeps_x_pairs",
        "extraction_docs_per_sec": docs_per_sec,
        "extraction_corpus_pages": n_pages,
        "extraction_reps": reps,
        "slowest": slowest,
        "queries": "full 2-dp map on the previous stdout line",
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
