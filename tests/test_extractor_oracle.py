"""Unit tests of the pure-Python oracle extractor (no Spark)."""

import struct

from ocr_processing_pipeline_spark.extractor.core import (
    PDF_MAGIC, FailureCode, extract_page)


def _pdf(blocks):
    out = bytearray(PDF_MAGIC)
    for kind, text in blocks:
        b = text.encode("utf-8")
        out.append(kind)
        out.extend(struct.pack(">I", len(b)))
        out.extend(b)
    out.append(0)
    out.extend(struct.pack(">I", 0))
    return bytes(out)


HTML = b"""<!DOCTYPE html><html><head><title>T</title>
<script>var x = 1;</script></head><body>
<nav><ul><li><a href="/a">home sweet home</a></li></ul></nav>
<article><h1>A fine heading</h1>
<p>This is the first real paragraph of the article with enough words to count.</p>
<p>Second paragraph also has plenty of words to pass the content classifier here.</p>
</article>
<div class="links"><a href="/x">one link</a> <a href="/y">two link</a> <a href="/z">three link</a></div>
<footer><a href="/i">impressum</a></footer></body></html>"""


def test_html_basic():
    res = extract_page(HTML)
    assert res.failure_code == FailureCode.OK
    assert "first real paragraph" in res.text
    assert "Second paragraph" in res.text
    assert "A fine heading" in res.text
    # boilerplate pruned
    assert "home sweet home" not in res.text
    assert "impressum" not in res.text
    assert "var x" not in res.text
    assert "T" != res.text.split("\n")[0]  # <title> not leaked
    # link-density list pruned
    assert "one link" not in res.text


def test_spans_monotone_in_bounds():
    res = extract_page(HTML)
    src = HTML.decode("utf-8")
    prev_end = -1
    for start, end in res.spans:
        assert 0 <= start < end <= len(src)
        assert start > prev_end
        prev_end = start  # blocks ordered by start
    # span text corresponds to the block content (first span = heading)
    s, e = res.spans[0]
    assert src[s:e] == "A fine heading"


def test_text_is_subsequence_of_source_words():
    res = extract_page(HTML)
    src_words = HTML.decode("utf-8").split()
    for w in res.text.split():
        assert any(w in sw for sw in src_words) or w in ("",)


def test_empty_and_pretext():
    assert extract_page(b"").failure_code == FailureCode.EMPTY
    assert extract_page(None).failure_code == FailureCode.EMPTY
    res = extract_page(b"", pre_text="Hello   world\nagain")
    assert res.failure_code == FailureCode.OK
    assert res.text == "Hello world again"
    assert res.content_kind == "text"


def test_pdf_branch():
    payload = _pdf([(1, "header"), (0, "First content block."),
                    (0, "Second  block\nhere."), (1, "footer")])
    res = extract_page(payload)
    assert res.failure_code == FailureCode.OK
    assert res.content_kind == "pdf"
    assert res.text == "First content block.\n\nSecond block here."
    assert res.n_blocks_total == 4 and res.n_blocks_kept == 2


def test_pdf_truncated():
    # drop the 5-byte terminator record: block intact, container truncated
    payload = _pdf([(0, "Complete block.")])[:-5]
    res = extract_page(payload)
    assert res.failure_code == FailureCode.PDF_TRUNCATED
    assert "Complete block." in res.text  # partial output preserved


def test_pdf_bad_magic():
    res = extract_page(b"%PDF-1.4 not our format")
    assert res.failure_code == FailureCode.PDF_BAD_MAGIC


def test_bad_encoding_flagged_but_extracted():
    bad = HTML[:-30] + b"\xff\xfe\xfa</body></html>"
    res = extract_page(bad)
    assert res.failure_code == FailureCode.ENCODING
    assert "first real paragraph" in res.text


def test_no_content():
    res = extract_page(b"<html><body><nav><a href='/'>x</a></nav></body></html>")
    assert res.failure_code == FailureCode.NO_CONTENT
    assert res.text == ""


def test_deterministic():
    a, b = extract_page(HTML), extract_page(HTML)
    assert a.text == b.text and a.spans == b.spans


def test_spans_cover_charrefs_exactly():
    """Block span ends must land on the true end of the block in the
    decoded source even when the block contains entity/char refs (the
    converted text is shorter than its source form)."""
    from ocr_processing_pipeline_spark.extractor.core import extract_page
    body = ("<html><body><p>Smith &amp; Jones traded ten bonds "
            "&#x26; five notes for Fr&#232;res</p>"
            "<p>&amp; leading ref block with enough words to keep "
            "alive here today</p></body></html>")
    res = extract_page(body.encode())
    src = body
    assert res.failure_code == ""
    assert "Smith & Jones" in res.text and "Frères" in res.text
    s0, e0 = res.spans[0]
    # end lands exactly past the last source char of the block
    assert src[e0 - 1] == "s" and src[e0:e0 + 4] == "</p>"
    assert src[s0] == "S"
    s1, e1 = res.spans[1]
    assert src[s1] == "&"          # span starts ON the leading ref
    assert src[e1:e1 + 4] == "</p>"


def test_adversarial_html_invariants():
    """Misnested tags, '>' inside attribute values, banned-tag nesting,
    entity runs, unclosed blocks: never crash, spans stay valid, text
    words come from the decoded source."""
    from html import unescape
    from ocr_processing_pipeline_spark.extractor.core import extract_page
    nasty = (
        '<html><body>'
        '<div><p>outer starts with plenty of words to keep this block '
        'alive <b>bold <i>misnested</b> italic</i> tail words here too</p>'
        '<p data-x="a > b" title=\'no"quote\'>attribute angle brackets '
        'should not break the block accounting at all here</p>'
        '<nav><div><script>var x = "<p>fake</p>";</script>'
        '<a href="/">menu</a></div></nav>'
        '<p>&amp;&amp;&amp; run of refs &#38;&#38; mixed with words '
        'making ten tokens easily &gt; previous block</p>'
        '<p>unclosed final block with sufficient words to be kept '
        'by the classifier today'
        '</body></html>')
    res = extract_page(nasty.encode())
    src = nasty
    assert res.failure_code == ""
    assert "fake" not in res.text            # script content pruned
    assert "menu" not in res.text            # nav pruned
    decoded = unescape(src)
    for w in set(res.text.split()):
        assert w in decoded, w
    prev = -1
    for s0, e0 in res.spans:
        assert 0 <= s0 < e0 <= len(src)
        assert s0 > prev
        assert not src[s0].isspace() and not src[e0 - 1].isspace()
        prev = e0
