"""Deterministic sentence/paragraph chunker (oracle for the Spark stage).

Reimplements the reference's semantic chunker semantics with deterministic
breakpoints (north rule drops model inference):

- W1 sentence segmentation        lora_chunking_api.py:274-276 (stanza)
- W2 cumulative token spans       lora_chunking_api.py:168-180
- W3 breakpoints: token budget 512 OR paragraph boundary (stands in for the
  cosine<0.89 similarity break)   lora_chunking_api.py:212-241, env
  CHUNK_TOKEN_LIMIT=512 / SIMILARITY_THRESHOLD=0.89 in docker-compose.yml
- W4 merge fold: a single-sentence chunk is merged into its predecessor iff
  the combined budget holds       lora_chunking_api.py:142-165 (:156)
- W5 window split: docs > 8192 tokens processed in windows of 8192 with
  overlap 256, spans remapped to global offsets
                                  lora_chunking_api.py:329-339;
                                  late_chunking_api.py:417-421
- W6 chunk_order numbering, chunk_id = "{doc_id}/{order}"
                                  lora_chunking_api.py:302,307

Pure function over (doc_id, text) → list of chunk dicts. Used by both the
Spark stage (pipeline/chunk.py) and pytest.
"""

from __future__ import annotations

from .textproc import split_sentences, token_spans, tokenize

CHUNK_TOKEN_LIMIT = 512
WINDOW_TOKEN_LIMIT = 8192
WINDOW_OVERLAP = 256


def _sentence_records(text: str) -> list[dict]:
    """Sentences with token counts and char spans into ``text``.

    A single "sentence" longer than the chunk budget (punctuation-free web
    page, minified junk) is hard-split at token boundaries so the ≤512
    invariant holds unconditionally — a web-scale robustness addition over
    the reference, which never sees such input (clean OCR text).
    """
    recs = []
    cursor = 0
    for sent, starts_para in split_sentences(text):
        start = text.find(sent, cursor)
        if start < 0:  # normalized whitespace edge; fall back to cursor
            start = cursor
        end = start + len(sent)
        cursor = end
        toks = tokenize(sent)
        if len(toks) <= CHUNK_TOKEN_LIMIT:
            recs.append({"sent": sent, "starts_para": starts_para,
                         "n_tokens": len(toks), "start": start, "end": end})
            continue
        spans = token_spans(sent)
        for piece_no, i in enumerate(range(0, len(spans),
                                           CHUNK_TOKEN_LIMIT)):
            piece = spans[i:i + CHUNK_TOKEN_LIMIT]
            p_start = start + piece[0][1]
            p_end = start + piece[-1][2]
            recs.append({
                "sent": sent[piece[0][1]:piece[-1][2]],
                "starts_para": starts_para and piece_no == 0,
                "n_tokens": len(piece),
                "start": p_start,
                "end": p_end,
            })
    return recs


def _chunk_sentence_run(recs: list[dict]) -> list[list[dict]]:
    """W3: greedy fold — new chunk on budget overflow or paragraph start."""
    chunks: list[list[dict]] = []
    cur: list[dict] = []
    cur_tokens = 0
    for r in recs:
        breakpoint_ = (
            cur
            and (cur_tokens + r["n_tokens"] > CHUNK_TOKEN_LIMIT
                 or r["starts_para"])
        )
        if breakpoint_:
            chunks.append(cur)
            cur, cur_tokens = [], 0
        cur.append(r)
        cur_tokens += r["n_tokens"]
    if cur:
        chunks.append(cur)
    return chunks


def _merge_single_sentence_chunks(chunks: list[list[dict]]) -> list[list[dict]]:
    """W4: merge a 1-sentence chunk into its predecessor if budget holds.

    Mirrors the reference's merge rule (lora_chunking_api.py:142-165): ONLY
    single-sentence chunks are merge candidates (:156), and the merge is
    applied left-to-right over the already-built chunk list.
    """
    merged: list[list[dict]] = []
    for ch in chunks:
        if (merged and len(ch) == 1):
            prev_tokens = sum(r["n_tokens"] for r in merged[-1])
            if prev_tokens + ch[0]["n_tokens"] <= CHUNK_TOKEN_LIMIT:
                merged[-1] = merged[-1] + ch
                continue
        merged.append(ch)
    return merged


def chunk_document(doc_id: str, text: str) -> list[dict]:
    """Chunk one document; returns rows for the ``chunks`` table.

    Output row: {chunk_id, doc_id, chunk_order, content, span_start,
    span_end, n_tokens, n_sentences}. chunk_order is gapless from 0 and
    derived from span order, never arrival order (SURVEY §7 hard part 3).
    """
    recs = _sentence_records(text)
    if not recs:
        return []

    # W5 note: the reference splits docs > 8192 tokens into overlapping
    # token windows because its embedding model has an 8192 context
    # (lora_chunking_api.py:329-339); the overlap exists for embedding
    # context, and its chunk duplicates are deduped by global-span remap
    # (late_chunking_api.py:417-421). With model inference dropped (north
    # rule), the greedy fold below IS the whole-document computation —
    # windowed re-chunking of overlap regions would produce boundary-
    # shifted overlapping chunks (a bug this code used to have, caught by
    # tests/test_giant_doc.py). Sentence char offsets are global, so
    # spans need no remap; WINDOW_TOKEN_LIMIT/WINDOW_OVERLAP remain as
    # the documented contract for a future embedding-bearing variant.
    all_chunks = _merge_single_sentence_chunks(_chunk_sentence_run(recs))

    # W6: deterministic ordering by span start, then number.
    all_chunks.sort(key=lambda ch: ch[0]["start"])
    rows = []
    for order, ch in enumerate(all_chunks):
        content = text[ch[0]["start"]:ch[-1]["end"]]
        rows.append({
            "chunk_id": f"{doc_id}/{order}",
            "doc_id": doc_id,
            "chunk_order": order,
            "content": content,
            "span_start": ch[0]["start"],
            "span_end": ch[-1]["end"],
            "n_tokens": sum(r["n_tokens"] for r in ch),
            "n_sentences": len(ch),
        })
    return rows


__all__ = ["chunk_document", "CHUNK_TOKEN_LIMIT", "WINDOW_TOKEN_LIMIT",
           "WINDOW_OVERLAP"]
