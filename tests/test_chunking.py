"""Unit tests of the deterministic chunker (W1-W6 semantics)."""

from ocr_processing_pipeline_spark.extractor.chunking import (
    CHUNK_TOKEN_LIMIT, WINDOW_TOKEN_LIMIT, chunk_document)
from ocr_processing_pipeline_spark.extractor.textproc import (
    split_sentences, token_count, tokenize)


def _mktext(n_sentences, words_per=10, paragraph_every=0):
    sents = []
    for i in range(n_sentences):
        s = " ".join(f"word{i}x{j}" for j in range(words_per)) + "."
        sents.append(s)
        if paragraph_every and (i + 1) % paragraph_every == 0:
            sents.append("\n\n")
    return " ".join(sents)


def test_tokenize_and_sentences():
    assert tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert token_count("a b c") == 3
    sents = split_sentences("One sentence here. Another one follows! Yes?")
    assert [s for s, _ in sents] == [
        "One sentence here.", "Another one follows!", "Yes?"]
    # abbreviation must not split
    sents = split_sentences("Dr. Müller kam. Er ging.")
    assert [s for s, _ in sents] == ["Dr. Müller kam.", "Er ging."]
    # paragraph flag
    sents = split_sentences("Para one.\n\nPara two.")
    assert sents[0][1] is True and sents[1][1] is True


def test_budget_respected():
    text = _mktext(100, words_per=20)  # 100 sents × ~21 tokens
    chunks = chunk_document("d", text)
    for c in chunks:
        assert c["n_tokens"] <= CHUNK_TOKEN_LIMIT


def test_order_gapless_and_spans_monotone():
    text = _mktext(50, words_per=15, paragraph_every=7)
    chunks = chunk_document("d", text)
    assert [c["chunk_order"] for c in chunks] == list(range(len(chunks)))
    assert [c["chunk_id"] for c in chunks] == [
        f"d/{i}" for i in range(len(chunks))]
    prev_end = -1
    for c in chunks:
        assert c["span_start"] >= prev_end  # non-overlapping
        assert c["span_start"] < c["span_end"] <= len(text)
        assert text[c["span_start"]:c["span_end"]] == c["content"]
        prev_end = c["span_end"]


def test_paragraph_breakpoint():
    text = "Short one. Short two.\n\nShort three. Short four."
    chunks = chunk_document("d", text)
    # paragraph boundary forces a break, then the single-sentence merge rule
    # does NOT merge chunk 2 (it has two sentences)
    assert len(chunks) == 2
    assert "Short one" in chunks[0]["content"]
    assert "Short three" in chunks[1]["content"]


def test_single_sentence_merge():
    # one paragraph with one short sentence after a paragraph break merges
    # back into predecessor when budget allows (lora_chunking_api.py:156)
    text = "First para sentence one. First para sentence two.\n\nLone."
    chunks = chunk_document("d", text)
    assert len(chunks) == 1
    assert "Lone." in chunks[0]["content"]


def test_single_sentence_no_merge_when_budget_exceeded():
    big = " ".join(f"w{i}" for i in range(CHUNK_TOKEN_LIMIT - 2)) + "."
    text = big + "\n\nLone."
    chunks = chunk_document("d", text)
    assert len(chunks) == 2


def test_window_split_giant_doc():
    # > 8192 tokens → window split; chunks still gapless, monotone, global
    text = _mktext(1000, words_per=12)
    assert token_count(text) > WINDOW_TOKEN_LIMIT
    chunks = chunk_document("d", text)
    assert [c["chunk_order"] for c in chunks] == list(range(len(chunks)))
    starts = [c["span_start"] for c in chunks]
    assert starts == sorted(starts)
    assert len(set(starts)) == len(starts)  # overlap dedup worked
    # coverage: every sentence's text appears in exactly the chunk run
    joined = " ".join(c["content"] for c in chunks)
    assert "word999x0" in joined and "word0x0" in joined


def test_deterministic():
    text = _mktext(60, words_per=14, paragraph_every=5)
    assert chunk_document("d", text) == chunk_document("d", text)


def test_empty():
    assert chunk_document("d", "") == []
    assert chunk_document("d", "   \n\n  ") == []
