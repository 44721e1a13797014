"""Keyword + hybrid search operators (reference Query/ entry points)."""

from pyspark.sql import functions as F

from ocr_processing_pipeline_spark.operators.search import (
    bm25_topk, hybrid_topk)

SF_DIR = "/root/testdata/sf0.001"


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [(1, "spark shuffle spark partition spark"),
         (2, "spark appears once here with other words"),
         (3, "nothing relevant in this document at all"),
         (4, "query planning and spark query optimization query")],
        "doc_id long, text string")
    top = bm25_topk(docs, "text", "doc_id", ["spark", "query"], k=3)
    rows = top.collect()
    keys = [r.key for r in rows]
    assert 3 not in keys                       # no-match doc excluded
    assert keys[0] == 4                        # matches both terms
    assert rows[0].bm25 > rows[-1].bm25 or len(rows) == 1


def test_bm25_deterministic(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = bm25_topk(d, "text", "doc_id", ["spark", "query"], k=10).collect()
    b = bm25_topk(d.repartition(7), "text", "doc_id",
                  ["spark", "query"], k=10).collect()
    assert [(r.key, r.bm25) for r in a] == [(r.key, r.bm25) for r in b]


def test_hybrid_fuses_both_signals(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    combined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "text", "embedding")
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 3).first()["embedding"]]
    hybrid = hybrid_topk(combined, "text", "doc_id", "embedding",
                         ["spark", "query"], qvec, alpha=0.25, k=10)
    rows = hybrid.collect()
    assert len(rows) == 10
    assert all(rows[i].score >= rows[i + 1].score
               for i in range(len(rows) - 1))
    # the query's own vector (doc 3) must surface via the vector leg
    from ocr_processing_pipeline_spark.operators.search import bm25_topk
    assert 3 in {r.key for r in rows} or 3 not in {
        r.key for r in bm25_topk(combined, "text", "doc_id",
                                 ["spark", "query"], k=50).collect()}


def test_jaccard_max_doc_freq_prunes_hot_shingles(spark):
    from ocr_processing_pipeline_spark.operators.dedup import (
        jaccard_pairs, shingles)
    docs = spark.createDataFrame(
        [(i, "common boiler plate " + f"unique{i} text{i} body{i}")
         for i in range(10)],
        "doc_id long, text string")
    sh = shingles(docs, "text", "doc_id", n=3)
    # without the cap: the shared "common boiler plate" shingle co-groups
    # all 45 pairs
    allpairs = jaccard_pairs(sh, min_jaccard=0.01)
    assert allpairs.count() == 45
    # with cap: the hot shingle is dropped, no pair shares anything
    assert jaccard_pairs(sh, min_jaccard=0.01,
                         max_doc_freq=5).count() == 0


def test_hybrid_scores_bounded_and_partition_invariant(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    combined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "text", "embedding")
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 5).first()["embedding"]]
    a = hybrid_topk(combined, "text", "doc_id", "embedding",
                    ["spark", "query"], qvec, k=10).collect()
    b = hybrid_topk(combined.repartition(7), "text", "doc_id", "embedding",
                    ["spark", "query"], qvec, k=10).collect()
    assert [(r.key, r.score) for r in a] == [(r.key, r.score) for r in b]
    # relative-score fusion: alpha*v + (1-alpha)*bm with legs in [0,1]
    assert all(0.0 <= r.score <= 1.0 for r in a)


def test_layered_chunks_come_from_top_docs(spark):
    from ocr_processing_pipeline_spark.operators.search import (
        bm25_topk, layered_topk)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    terms = ["spark", "query", "window"]
    top_docs = {r.key for r in
                bm25_topk(d, "text", "doc_id", terms, k=20).collect()}
    chunks = layered_topk(d, "text", "doc_id", terms,
                          doc_k=20, k=10).collect()
    assert len(chunks) == 10
    assert {r.key for r in chunks} <= top_docs
    assert all(chunks[i].score >= chunks[i + 1].score
               for i in range(len(chunks) - 1))
