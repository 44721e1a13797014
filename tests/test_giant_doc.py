"""Scale robustness: one giant document must not break a task or a batch.

The reference's worst doc took 108.9s (emissions_per_doc.csv max); at web
scale single pages reach MBs. This drives a ~1.5 MB page (≈250k tokens)
through the REAL Spark stages and checks the W5 window path + invariants.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_processing_pipeline_spark.extractor.chunking import (
    CHUNK_TOKEN_LIMIT, WINDOW_TOKEN_LIMIT)
from ocr_processing_pipeline_spark.pipeline.chunk import chunk_docs
from ocr_processing_pipeline_spark.pipeline.extract import extract_docs
from ocr_processing_pipeline_spark.sources.corpus import PAGES_SCHEMA


def _giant_page(n_paras=2500, words_per=100):
    paras = "".join(
        "<p>" + " ".join(
            f"w{p}x{w} und der bericht" for w in range(words_per // 5))
        + ".</p>"
        for p in range(n_paras))
    html = (f"<html><body><article><h1>Giant</h1>{paras}</article>"
            "</body></html>").encode()
    return {"url": "https://big.example/giant", "warc_ts": None,
            "html": html, "text": "", "lang": "de"}


def test_giant_doc_through_spark(spark, tmp_path):
    import datetime, os
    row = _giant_page()
    row["warc_ts"] = datetime.datetime(2024, 1, 1)
    p = str(tmp_path / "giant")
    os.makedirs(p)
    pq.write_table(pa.Table.from_pylist([row], schema=PAGES_SCHEMA),
                   p + "/g.parquet")
    pages = spark.read.parquet(p)
    docs = extract_docs(pages)
    d = docs.collect()[0]
    assert d["failure_code"] == ""
    assert d["token_length"] > WINDOW_TOKEN_LIMIT * 3   # window path taken

    chunks = chunk_docs(docs).toPandas().sort_values("chunk_order")
    assert len(chunks) > 100
    assert (chunks["n_tokens"] <= CHUNK_TOKEN_LIMIT).all()
    assert list(chunks["chunk_order"]) == list(range(len(chunks)))
    assert (chunks["span_start"].values[1:]
            >= chunks["span_end"].values[:-1]).all()
    # full token coverage across windows (no gaps from overlap dedup)
    assert chunks["n_tokens"].sum() >= d["token_length"] * 0.99
