"""Committed golden outputs: pins pipeline semantics ACROSS rounds.

The byte-identity parity suite compares Spark against the oracle computed
on the fly — if extractor semantics drift accidentally, both sides drift
together and parity still passes. This golden file
(tests/goldens/corpus40_v3.json) was committed at a known-good state; any
change to extraction / chunking / NER semantics fails here and must be a
CONSCIOUS decision (regenerate via the snippet in the golden file's git
history, bump the filename version, and say why in the commit message).
"""

import hashlib
import json
import os

from ocr_processing_pipeline_spark.extractor.chunking import chunk_document
from ocr_processing_pipeline_spark.extractor.core import extract_page
from ocr_processing_pipeline_spark.extractor.ner import (
    GazetteerIndex, link_mentions)
from ocr_processing_pipeline_spark.sources.corpus import make_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "corpus40_v3.json")


def test_semantics_match_committed_goldens():
    with open(GOLDEN) as f:
        golden = json.load(f)
    rows, (persons, places, orgs) = make_pages(40)
    idx = GazetteerIndex(persons, places, orgs)
    assert len(rows) == len(golden)
    for r in rows:
        g = golden[r["url"]]
        res = extract_page(r["html"], r["text"])
        assert hashlib.sha256(res.text.encode()).hexdigest() \
            == g["text_sha256"], r["url"]
        assert res.failure_code == g["failure_code"], r["url"]
        assert res.content_kind == g["content_kind"], r["url"]
        assert [list(s) for s in res.spans[:3]] == g["spans"], r["url"]
        chunks = chunk_document("d", res.text) if res.text else []
        assert len(chunks) == g["n_chunks"], r["url"]
        n_edges = 0
        memo = {}
        for c in chunks:
            n_edges += len(link_mentions(
                idx.scan(c["content"]), idx, r["warc_ts"].date(),
                c["content"], memo=memo))
        assert n_edges == g["n_edges"], r["url"]
