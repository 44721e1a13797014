"""End-to-end extraction job: pages → docs + chunks + mentions + edges.

Partitioning strategy (north rule: explicit skew handling + url-hash range
partitioning + AQE):

- The corpus is host-skewed (one host ≈ 50% of rows, FIXTURES.md §1). A
  naive ``repartition(host)`` would put half the corpus in one task. We
  repartition on the **salted url-hash bucket** —
  ``pmod(xxhash64(url), n_buckets)`` — which is uniform regardless of host
  skew (xxhash64 of distinct urls ≈ uniform), and is simultaneously the
  resumability commit unit (lineage.py). Per-doc cost skew (a giant page)
  is bounded by the Arrow batch cap (session.py) + AQE.
- All three derived tables are computed from ONE pass over pages: extract →
  chunk → ner are narrow (mapInPandas) transforms, so the only shuffle in
  the whole job is the single repartition to n_buckets, reused by every
  write (docs/chunks/edges inherit the bucket partitioning).
- Gazetteers are broadcast (J1) — no shuffle for the linking "join".

This file is also the ``spark-submit --py-files`` entry point:

    python -m ocr_processing_pipeline_spark.pipeline.job \
        --pages .../pages.parquet --gazetteers-dir ... --out ... [--cpus N]

(tools/package_pyfiles.py builds the zip for --py-files.)
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import chunk as chunk_mod
from . import extract as extract_mod
from . import lineage
from . import ner as ner_mod

DEFAULT_N_BUCKETS = 64


def _ensure_meta(out_dir: str, meta_path: str, n_buckets: int) -> None:
    """Record the n_buckets contract once, BEFORE any checkpoint state
    or data write lands under out_dir (both write sites share this so
    the ordering invariant can't drift between them)."""
    if not os.path.exists(meta_path):
        os.makedirs(out_dir, exist_ok=True)
        with open(meta_path, "w") as fh:
            json.dump({"n_buckets": n_buckets}, fh)


def run_pipeline(spark: SparkSession, pages_path: str, gazetteers_dir: str,
                 out_dir: str, n_buckets: int = DEFAULT_N_BUCKETS,
                 resume: bool = True,
                 with_mentions: bool = False,
                 fail_after_buckets: int | None = None,
                 max_page_bytes: int | None = None) -> dict:
    """Run (or resume) the full pipeline; returns per-table row counts.

    ``fail_after_buckets`` processes only that many remaining buckets — the
    hook the resume test uses to simulate a mid-run crash.
    """
    checkpoint_path = os.path.join(out_dir, "checkpoint")
    meta_path = os.path.join(out_dir, "checkpoint_meta.json")

    # n_buckets contract: every committed bucket id and the all-committed
    # check below are defined RELATIVE to the n_buckets the checkpoint
    # was written with. Resuming with a different value silently
    # re-buckets the url space — committed ids no longer mean what the
    # anti-join assumes (e.g. old 32 → new 128 would reprocess already-
    # committed pages into different bucket partitions: duplicates). A
    # mismatch must fail loudly, never mis-decide.
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("n_buckets") != n_buckets:
            raise ValueError(
                f"checkpoint at {out_dir} was written with n_buckets="
                f"{meta.get('n_buckets')}; resume invoked with "
                f"n_buckets={n_buckets}. Bucket ids are not comparable "
                "across bucket counts — rerun with the original value "
                "(or start a fresh out dir).")

    # all-committed fast path: commits are BUCKET-level, so when every
    # bucket id is already in the checkpoint the anti-join below is empty
    # by construction — detect that from the tiny checkpoint table alone
    # (O(n_buckets) rows) BEFORE even opening the input (reading the
    # pages path would list and footer-read every shard). A 100 TB no-op
    # resume must not touch the 100 TB. (Empty buckets carry sentinel
    # rows — see empty_bucket_sentinels — so the check also closes for
    # corpora that leave buckets empty.)
    prior_done: set[int] = set()
    if resume and lineage._exists(checkpoint_path):
        prior_done = {r.bucket for r in lineage.committed_buckets(
            spark, checkpoint_path, "docs").collect()}
        if prior_done >= set(range(n_buckets)):
            return {"docs": 0, "chunks": 0, "edges": 0, "checkpoint": 0,
                    "skipped": "nothing to do (all buckets committed)"}

    pages = spark.read.parquet(pages_path)
    todo = (lineage.remaining_pages(spark, pages, checkpoint_path, "docs",
                                    n_buckets)
            if resume else lineage.with_bucket(pages, n_buckets))
    if fail_after_buckets is not None:
        some = [r.bucket for r in
                todo.select("bucket").distinct()
                    .orderBy("bucket").limit(fail_after_buckets).collect()]
        todo = todo.filter(F.col("bucket").isin(some))

    # buckets touched by THIS run. Fresh run (no checkpoint): all buckets
    # by construction — skip the discovery scan entirely.
    checkpoint_exists = lineage._exists(checkpoint_path)
    if resume and not checkpoint_exists and fail_after_buckets is None:
        run_buckets = list(range(n_buckets))
    else:
        run_buckets = [r.bucket for r in
                       todo.select("bucket").distinct().collect()]
    if not run_buckets:
        # todo is EMPTY, so every bucket not yet committed has zero
        # remaining pages — commit its sentinel now, or the no-op fast
        # path above can never close (e.g. resuming over a checkpoint
        # whose non-empty buckets are all committed but whose empty
        # buckets predate sentinel rows). Guard: a fail_after_buckets
        # run empties todo ARTIFICIALLY (its filter can select zero
        # buckets), so only a full run may conclude emptiness. With
        # resume=True, prior_done already IS the committed set (read
        # moments ago, nothing written since); only a resume=False run
        # (which skipped that read) must fetch it here — range - {}
        # would otherwise stack full-range 'empty' sentinels onto
        # buckets that hold real committed rows.
        if fail_after_buckets is None:
            committed = prior_done
            if not resume and lineage._exists(checkpoint_path):
                committed = {r.bucket for r in lineage.committed_buckets(
                    spark, checkpoint_path, "docs").collect()}
            missing = sorted(set(range(n_buckets)) - committed)
            if missing:
                # sentinels are checkpoint state too — the n_buckets
                # contract must land first (same invariant as below)
                _ensure_meta(out_dir, meta_path, n_buckets)
                lineage.append_checkpoint(
                    lineage.empty_bucket_sentinels(spark, missing,
                                                   "docs"),
                    checkpoint_path)
        return {"docs": 0, "chunks": 0, "edges": 0, "checkpoint": 0,
                "skipped": "nothing to do (all buckets committed)"}

    # record the n_buckets contract BEFORE the first data write: docs
    # parquet lands before the checkpoint rows, so a crash mid-run must
    # already leave the meta guard in place — otherwise a later resume
    # with a different n_buckets would pass the check above and
    # re-bucket a half-written output.
    _ensure_meta(out_dir, meta_path, n_buckets)

    # ONE shuffle: uniform url-hash bucket repartition (skew-proof).
    todo = todo.repartition(min(n_buckets, len(run_buckets)), "bucket")

    gaz_bc = ner_mod.load_gazetteers(
        spark,
        os.path.join(gazetteers_dir, "persons.parquet"),
        os.path.join(gazetteers_dir, "places.parquet"),
        os.path.join(gazetteers_dir, "orgs.parquet"))

    # max_page_bytes: None (default) -> extract_docs' own 100 MiB
    # default; 0 -> gate disabled; > 0 -> that threshold. (A plain
    # pass-through of None would silently re-enable the default against
    # extract_docs' documented "None disables".)
    if max_page_bytes is None:
        extract_kw = {}
    elif max_page_bytes <= 0:
        extract_kw = {"max_page_bytes": None}
    else:
        extract_kw = {"max_page_bytes": max_page_bytes}
    docs = extract_mod.extract_docs(todo, **extract_kw).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))
    docs_path = os.path.join(out_dir, "docs")
    lineage.write_partitioned(docs, docs_path)

    # chunk + ner read back the just-written docs for THIS run's buckets:
    # narrow scans (partition-pruned on bucket) — extraction runs exactly
    # once, never recomputed for downstream stages.
    docs_this_run = spark.read.parquet(docs_path).filter(
        F.col("bucket").isin(run_buckets))

    chunks = chunk_mod.chunk_docs(docs_this_run).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))
    chunks_path = os.path.join(out_dir, "chunks")
    lineage.write_partitioned(chunks, chunks_path)

    chunks_this_run = spark.read.parquet(chunks_path).filter(
        F.col("bucket").isin(run_buckets))
    edges = ner_mod.link_entities(chunks_this_run, gaz_bc).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))
    edges_path = os.path.join(out_dir, "edges")
    lineage.write_partitioned(edges, edges_path)

    if with_mentions:
        # raw mention spans (FIXTURES.md §3 'entities' table) — optional:
        # an extra scan pass over chunks, off by default
        mentions = (ner_mod.extract_mentions(chunks_this_run, gaz_bc)
                    .join(chunks_this_run.select("chunk_id", "url"),
                          "chunk_id")
                    .withColumn("bucket", F.pmod(F.xxhash64("url"),
                                                 F.lit(n_buckets))
                                .cast("int")))
        lineage.write_partitioned(
            mentions, os.path.join(out_dir, "mentions"))

    # lineage/metrics rows LAST (commit point) — crash before this line ⇒
    # buckets get reprocessed and dynamically overwritten next run.
    ckpt = lineage.checkpoint_rows_with_failures(docs_this_run, "docs")
    if fail_after_buckets is None:
        # this run exhausted the todo set, so any bucket neither
        # previously committed nor producing rows now has ZERO pages —
        # commit sentinels so the no-op fast path closes over them.
        # (A partial run — fail_after_buckets — must NOT: its untouched
        # buckets may still hold pages.)
        ckpt = ckpt.localCheckpoint()   # one evaluation: probe + append
        have = {r.bucket for r in ckpt.select("bucket").collect()}
        empty = sorted(set(range(n_buckets)) - prior_done - have)
        if empty:
            ckpt = ckpt.unionByName(
                lineage.empty_bucket_sentinels(spark, empty, "docs"))
    lineage.append_checkpoint(ckpt, checkpoint_path)

    return {
        "docs": spark.read.parquet(docs_path).count(),
        "chunks": spark.read.parquet(chunks_path).count(),
        "edges": spark.read.parquet(edges_path).count(),
        "checkpoint": spark.read.parquet(checkpoint_path).count(),
    }


def main(argv=None):
    from ..session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--gazetteers-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-buckets", type=int, default=DEFAULT_N_BUCKETS)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    def _non_negative_bytes(s: str) -> int:
        v = int(s)
        if v < 0:
            # a typo'd negative must error, not silently disable the gate
            raise argparse.ArgumentTypeError(
                "--max-page-bytes must be >= 0 (0 disables the gate)")
        return v

    ap.add_argument("--max-page-bytes", type=_non_negative_bytes,
                    default=None,
                    help="quarantine pages whose html or text exceeds "
                         "this many bytes (failure_code=OVERSIZED_INPUT). "
                         "Omit for the 100 MiB default; pass 0 to disable "
                         "the gate entirely (negative values are rejected)")
    args = ap.parse_args(argv)

    spark = get_spark("extraction_job", cpus=args.cpus)
    t0 = time.time()
    counts = run_pipeline(spark, args.pages, args.gazetteers_dir, args.out,
                          n_buckets=args.n_buckets,
                          resume=not args.no_resume,
                          max_page_bytes=args.max_page_bytes)
    elapsed = time.time() - t0
    print(json.dumps({"elapsed_sec": round(elapsed, 2), **counts}))


if __name__ == "__main__":
    main()
