"""Keyword search: TF-IDF / BM25 top-k over a text corpus.

The deterministic half of the reference's search entry points
(Query/search.py:46-70 hybrid = BM25 + vector, alpha 0.25;
Query/layered_search.py:74-104 coarse-to-fine). The vector half runs over
an embedding column via operators/similarity.py; ``hybrid_topk`` fuses
both exactly like Weaviate's alpha blend. No model inference (north rule):
query and corpus meet on exact token match + statistical weighting.

All relational: tokenize with split/explode (codegen), one groupBy for
document stats, one for term stats, one join per query term (query terms
are a literal list → broadcast). BM25 parameters k1=1.2, b=0.75 (Robertson
et al., the standard defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
        " ")
    return (df.select(F.col(key_col).alias("key"),
                      F.size(toks).alias("doc_len"),
                      F.explode(toks).alias("term"))
            .filter(F.length("term") > 0))


def bm25_topk(df: DataFrame, text_col: str, key_col: str,
              query_terms: list[str], k: int = 10,
              round_to: int = 4) -> DataFrame:
    """Exact BM25 top-k for one query; deterministic tie-break on key."""
    terms = [t.lower() for t in query_terms]
    tok = _tokens(df, text_col, key_col)
    n_docs = df.count()
    avg_len = (tok.groupBy("key").agg(F.max("doc_len").alias("l"))
               .agg(F.avg("l")).first()[0])

    tf = (tok.filter(F.col("term").isin(terms))
          .groupBy("key", "term")
          .agg(F.count(F.lit(1)).alias("tf"),
               F.max("doc_len").alias("doc_len")))
    df_counts = tf.groupBy("term").agg(
        F.countDistinct("key").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0)
    scored = (tf.join(F.broadcast(df_counts), "term")
              .withColumn(
                  "w",
                  idf * (F.col("tf") * (BM25_K1 + 1))
                  / (F.col("tf") + BM25_K1
                     * (1 - BM25_B
                        + BM25_B * F.col("doc_len") / F.lit(avg_len)))))
    return (scored.groupBy("key")
            .agg(F.round(F.sum("w"), round_to).alias("bm25"))
            .orderBy(F.desc("bm25"), F.asc("key"))
            .limit(k))


def hybrid_topk(df: DataFrame, text_col: str, key_col: str,
                vec_col: str, query_terms: list[str], query_vec: list,
                alpha: float = 0.25, k: int = 10) -> DataFrame:
    """Weaviate-style hybrid: alpha·vector + (1-alpha)·keyword, each
    rank-normalized (reciprocal-rank fusion variant, alpha=0.25 as in
    Query/search.py:61)."""
    from .similarity import cosine_to
    from pyspark.sql import Window
    bm = bm25_topk(df, text_col, key_col, query_terms, k=max(k * 5, 50))
    vec = (df.select(F.col(key_col).alias("key"),
                     F.round(cosine_to(query_vec, F.col(vec_col)), 5)
                     .alias("cosine"))
           .orderBy(F.desc("cosine"), F.asc("key")).limit(max(k * 5, 50)))
    w_bm = Window.orderBy(F.desc("bm25"), F.asc("key"))
    w_v = Window.orderBy(F.desc("cosine"), F.asc("key"))
    bm_r = bm.withColumn("r_bm", F.row_number().over(w_bm))
    v_r = vec.withColumn("r_v", F.row_number().over(w_v))
    fused = (bm_r.join(v_r, "key", "full_outer")
             .withColumn(
                 "score",
                 F.round((1 - alpha) / (60 + F.coalesce("r_bm", F.lit(10**6)))
                         + alpha / (60 + F.coalesce("r_v", F.lit(10**6))),
                         8)))
    return (fused.select("key", "score")
            .orderBy(F.desc("score"), F.asc("key")).limit(k))


__all__ = ["bm25_topk", "hybrid_topk", "BM25_K1", "BM25_B"]
