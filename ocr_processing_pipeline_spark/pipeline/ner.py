"""NER + entity-linking stage: chunks → mentions + edges.

The gazetteers are small dimension tables (≪ corpus): they are collected
once on the driver and shipped to executors as a **broadcast variable** —
the Spark analogue of the reference's per-entity-name network round-trip to
Weaviate (apertus_ner_chunk.py:134-232, J1). The trie index is built lazily
once per executor (module-level cache keyed by broadcast id — the
"model singleton per process" pattern of lora_chunking_api.py:71-76, without
models).

Two outputs:
- mentions: every gazetteer hit with char span (U4 replacement)
- edges:    linked entities after fuzzy/date/url/role filters
            (F5-F7, F11, J5-replacement), shaped after the SPARQL inserts
            at apertus_ner_chunk.py:328-389 (K3)

Language routing (F8) happens inside the UDF via the per-chunk lang column —
no driver-side split, exactly one pass over the data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MENTIONS_SCHEMA = (
    "doc_id long, chunk_id string, mention string, entity_type string, "
    "span_start long, span_end long, lang string"
)

EDGES_SCHEMA = (
    "doc_id long, url string, chunk_id string, subject string, "
    "predicate string, object string, mention string, entity_type string, "
    "fuzzy_score int, span_start long, span_end long"
)

_INDEX_CACHE: dict = {}

# linking decisions are pure in (mention, entity_type) given an index, so
# the candidate memo lives for the WORKER lifetime next to the trie
# singleton instead of per task: with 32 input splits a per-task memo
# re-scores the corpus's distinct mentions once per task (Zipfian heads
# repeat in every split), which multiplied the fuzzy work ~16x at sf0.1.
# Cleared together with the index when the gazetteer broadcast changes;
# size-capped as a leak guard for unbounded production vocabularies.
_MEMO_MAX_ENTRIES = 1_000_000


def _get_index(bc):
    return _get_index_and_memo(bc)[0]


def _get_index_and_memo(bc):
    # key on the uuid token shipped INSIDE the broadcast value: id(bc) can
    # be reused by a different broadcast after GC in a long-lived python
    # worker, which would serve a stale trie built from other gazetteers
    value = bc.value
    if isinstance(value, tuple) and len(value) == 4:
        key, persons, places, orgs = value
    else:  # legacy 3-tuple broadcasts (no token): fall back to identity
        key, (persons, places, orgs) = id(bc), value
    entry = _INDEX_CACHE.get(key)
    if entry is None:
        from ..extractor.ner import GazetteerIndex
        entry = (GazetteerIndex(persons, places, orgs), {})
        _INDEX_CACHE.clear()
        _INDEX_CACHE[key] = entry
    idx, memo = entry
    if len(memo) > _MEMO_MAX_ENTRIES:
        memo.clear()
    return idx, memo


def load_gazetteers(spark: SparkSession, persons_path: str,
                    places_path: str, orgs_path: str):
    """Read gazetteer parquet, collect (small), broadcast.

    The broadcast tuple carries a uuid token as a stable cache identity
    for the per-worker trie singleton (see _get_index)."""
    import uuid
    persons = [r.asDict() for r in spark.read.parquet(persons_path).collect()]
    places = [r.asDict() for r in spark.read.parquet(places_path).collect()]
    orgs = [r.asDict() for r in spark.read.parquet(orgs_path).collect()]
    return spark.sparkContext.broadcast(
        (uuid.uuid4().hex, persons, places, orgs))


def extract_mentions(chunks: DataFrame, gaz_bc) -> DataFrame:
    def scan_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = _get_index(gaz_bc)
        for pdf in batches:
            rows = []
            for doc_id, chunk_id, content, lang in zip(
                    pdf["doc_id"], pdf["chunk_id"], pdf["content"],
                    pdf["lang"]):
                for m in idx.scan(content):
                    rows.append({
                        "doc_id": doc_id, "chunk_id": chunk_id,
                        "mention": m["mention"],
                        "entity_type": m["entity_type"],
                        "span_start": m["span_start"],
                        "span_end": m["span_end"], "lang": lang,
                    })
            yield pd.DataFrame(rows, columns=[
                "doc_id", "chunk_id", "mention", "entity_type",
                "span_start", "span_end", "lang"])

    return (chunks.select("doc_id", "chunk_id", "content", "lang")
            .mapInPandas(scan_batches, schema=MENTIONS_SCHEMA))


def link_entities(chunks: DataFrame, gaz_bc) -> DataFrame:
    """chunks → edges, one Arrow pass (scan + link fused, no shuffle)."""
    def link_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extractor.ner import link_mentions
        # worker-lifetime memo (see _get_index_and_memo): mention
        # frequency is Zipfian, so most link decisions repeat; the cache
        # turns O(chunks × fuzz) into O(distinct mentions × fuzz) — per
        # WORKER, not per task
        idx, memo = _get_index_and_memo(gaz_bc)
        for pdf in batches:
            rows = []
            for doc_id, url, chunk_id, content, warc_ts in zip(
                    pdf["doc_id"], pdf["url"], pdf["chunk_id"],
                    pdf["content"], pdf["warc_ts"]):
                doc_date = (warc_ts.date()
                            if warc_ts is not None and not pd.isna(warc_ts)
                            else None)
                mentions = idx.scan(content)
                for e in link_mentions(mentions, idx, doc_date, content,
                                       memo=memo):
                    rows.append({
                        "doc_id": doc_id, "url": url, "chunk_id": chunk_id,
                        "subject": chunk_id,
                        "predicate": e["predicate"],
                        "object": e["matched_url"],
                        "mention": e["mention"],
                        "entity_type": e["entity_type"],
                        "fuzzy_score": e["fuzzy_score"],
                        "span_start": e["span_start"],
                        "span_end": e["span_end"],
                    })
            yield pd.DataFrame(rows, columns=[
                "doc_id", "url", "chunk_id", "subject", "predicate",
                "object", "mention", "entity_type", "fuzzy_score",
                "span_start", "span_end"])

    return (chunks.select("doc_id", "url", "chunk_id", "content", "warc_ts")
            .mapInPandas(link_batches, schema=EDGES_SCHEMA))


__all__ = ["load_gazetteers", "extract_mentions", "link_entities",
           "MENTIONS_SCHEMA", "EDGES_SCHEMA"]
