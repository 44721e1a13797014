"""Deterministic main-content extractor (HTML boilerplate strip + PDF branch).

This module IS the extraction semantics: the Spark stage
(``pipeline/extract.py``) and the pytest parity suite both call
:func:`extract_page`, so byte-identity between the distributed run and the
single-threaded oracle holds by construction and is *verified* (not assumed)
by ``tests/test_extract_parity.py``.

Heuristics are Readability/trafilatura/boilerpipe-style (public literature;
see PAPERS.md): prune banned subtrees (nav/footer/aside/script/...), compute
per-block word count + link density, classify blocks as content vs
boilerplate, rescue short blocks sandwiched between content blocks, emit
normalized text joined by blank lines plus char-span offsets into the decoded
source.

The reference repo has no HTML extractor (its inputs are pre-OCR'd .txt files
fetched over HTTP, Data/OCR_data_crawler.py:63-75 in /root/reference); per
the north rule this deterministic module plays the role of "the reference
extractor" for the byte-identity invariant.

Everything here is stdlib-only and deterministic — no lxml/bs4 version drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape as _unescape
from html.parser import HTMLParser

# --- failure codes (replaces the reference's error_log.txt / missing_files.txt
#     ledgers, lora_chunking_container/orchestrator.py:53-55) -----------------


class FailureCode:
    OK = ""
    EMPTY = "EMPTY_INPUT"
    ENCODING = "ENCODING_ERROR"
    MALFORMED = "MALFORMED_HTML"
    PDF_TRUNCATED = "PDF_TRUNCATED"
    PDF_BAD_MAGIC = "PDF_BAD_MAGIC"
    NO_CONTENT = "NO_CONTENT"
    # assigned by the Spark stage's byte-length pre-filter, never by
    # extract_page itself (the gate is a pipeline routing decision;
    # the pure extractor has no size opinion)
    OVERSIZED = "OVERSIZED_INPUT"


# Synthetic PDF-ish container (FIXTURES.md §1): magic, then repeated
# [kind:1][len:4 big-endian][payload utf-8] records, kind 0 = content,
# kind 1 = layout boilerplate (header/footer). Zero-length record terminates.
PDF_MAGIC = b"%SPDF1\n"

# Subtrees that never contribute content (boilerpipe-style hard prune).
_BANNED_TAGS = frozenset(
    {"script", "style", "nav", "footer", "aside", "header", "form",
     "noscript", "iframe", "svg", "template", "button", "select",
     "head", "title"}
)

# Elements that delimit text blocks.
_BLOCK_TAGS = frozenset(
    {"p", "div", "article", "main", "section", "h1", "h2", "h3", "h4", "h5",
     "h6", "li", "td", "th", "pre", "blockquote", "ul", "ol", "table", "tr",
     "body", "html", "figcaption", "dd", "dt"}
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Void elements (no closing tag) — keeps the depth bookkeeping honest.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

_WS_RE = re.compile(r"\s+")

# Block classification thresholds (pinned; exercised by unit tests).
MIN_CONTENT_WORDS = 10       # boilerpipe's "long block" word floor
MAX_LINK_DENSITY = 0.33      # readability-style link-density prune
MIN_RESCUE_WORDS = 3         # sandwiched-short-block rescue floor


@dataclass
class _Block:
    tag: str
    depth: int
    text_parts: list = field(default_factory=list)
    link_chars: int = 0
    start: int = -1           # char offset of first text char in decoded html
    end: int = -1             # char offset just past last text char
    in_article: bool = False  # inside <article>/<main> → score boost
    _text_cache: str = None   # normalized text, computed once per block

    def text(self) -> str:
        if self._text_cache is None:
            self._text_cache = _WS_RE.sub(
                " ", "".join(self.text_parts)).strip()
        return self._text_cache


class _BlockParser(HTMLParser):
    """Single-pass DOM walk that flushes flat text blocks with offsets."""

    def __init__(self, source: str):
        # convert_charrefs=False: with conversion on, handle_data receives
        # CONVERTED text ('&' for '&amp;') whose length is shorter than the
        # source segment, so block span ends undershot the true end in the
        # decoded source. Refs are handled explicitly below with their
        # SOURCE lengths, keeping the span contract exact.
        super().__init__(convert_charrefs=False)
        self._source = source
        # absolute offset of the start of each line, for getpos() conversion
        self._line_offsets = [0]
        for m in re.finditer("\n", source):
            self._line_offsets.append(m.end())
        self.blocks: list[_Block] = []
        self._banned_depth = 0
        self._link_depth = 0
        self._article_depth = 0
        self._depth = 0
        self._cur: _Block | None = None

    def _offset(self) -> int:
        line, col = self.getpos()
        return self._line_offsets[line - 1] + col

    def _flush(self, next_tag: str = "div") -> None:
        if self._cur is not None and self._cur.text():
            self.blocks.append(self._cur)
        self._cur = _Block(
            tag=next_tag, depth=self._depth, in_article=self._article_depth > 0
        )

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br" and self._cur is not None:
                self._cur.text_parts.append(" ")
            return
        self._depth += 1
        if tag in _BANNED_TAGS:
            self._banned_depth += 1
            return
        if self._banned_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in ("article", "main"):
            self._article_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush(next_tag=tag)

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        self._depth = max(0, self._depth - 1)
        if tag in _BANNED_TAGS:
            self._banned_depth = max(0, self._banned_depth - 1)
            return
        if self._banned_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in ("article", "main"):
            self._article_depth = max(0, self._article_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._banned_depth or not data:
            return
        if self._cur is None:
            self._cur = _Block(tag="body", depth=self._depth,
                               in_article=self._article_depth > 0)
        if data.strip():
            off = self._offset()
            if self._cur.start < 0:
                # getpos() points at the start of the data run; skip leading ws
                lead = len(data) - len(data.lstrip())
                self._cur.start = off + lead
            self._cur.end = off + len(data.rstrip())
        self._cur.text_parts.append(data)
        if self._link_depth:
            self._cur.link_chars += len(data.strip())

    def _handle_ref(self, prefix_len: int, name: str):
        """Entity/char ref: append the converted char(s) to the block but
        advance the span bounds by the ref's SOURCE length."""
        if self._banned_depth:
            return
        off = self._offset()
        src_len = prefix_len + len(name)
        if self._source[off + src_len:off + src_len + 1] == ";":
            src_len += 1
        converted = _unescape(self._source[off:off + src_len])
        if not converted:
            return
        if self._cur is None:
            self._cur = _Block(tag="body", depth=self._depth,
                               in_article=self._article_depth > 0)
        if converted.strip():
            if self._cur.start < 0:
                self._cur.start = off
            self._cur.end = off + src_len
        self._cur.text_parts.append(converted)
        if self._link_depth:
            self._cur.link_chars += len(converted.strip())

    def handle_entityref(self, name):      # '&amp;' / '&amp'
        self._handle_ref(1, name)

    def handle_charref(self, name):        # '&#65;' / '&#x41;'
        self._handle_ref(2, name)

    def close(self):
        super().close()
        self._flush()


@dataclass
class ExtractResult:
    text: str
    spans: list          # list[(start, end)] char offsets into decoded source
    failure_code: str
    n_blocks_total: int = 0
    n_blocks_kept: int = 0
    content_kind: str = "html"   # html | pdf | text


def _word_count(s: str) -> int:
    return len(s.split())


def _classify(blocks: list[_Block]) -> list[bool]:
    """Boilerpipe-style per-block content classification + rescue pass."""
    keep = []
    for b in blocks:
        txt = b.text()
        words = _word_count(txt)
        nchars = len(txt)
        link_density = (b.link_chars / nchars) if nchars else 1.0
        if b.tag in _HEADING_TAGS:
            keep.append(words >= 1 and link_density <= MAX_LINK_DENSITY)
        elif b.in_article:
            # inside <article>/<main>: lenient floor, still prune link lists
            keep.append(words >= MIN_RESCUE_WORDS
                        and link_density <= MAX_LINK_DENSITY)
        else:
            keep.append(words >= MIN_CONTENT_WORDS
                        and link_density <= MAX_LINK_DENSITY)
    # rescue: short low-link block sandwiched between two kept blocks
    for i in range(1, len(blocks) - 1):
        if keep[i]:
            continue
        b = blocks[i]
        txt = b.text()
        nchars = len(txt)
        link_density = (b.link_chars / nchars) if nchars else 1.0
        if (keep[i - 1] and keep[i + 1]
                and _word_count(txt) >= MIN_RESCUE_WORDS
                and link_density <= MAX_LINK_DENSITY):
            keep[i] = True
    return keep


def _extract_html(source: str) -> ExtractResult:
    parser = _BlockParser(source)
    try:
        parser.feed(source)
        parser.close()
    except Exception:
        # html.parser is forgiving; anything it raises on is truly malformed
        return ExtractResult("", [], FailureCode.MALFORMED)
    blocks = parser.blocks
    keep = _classify(blocks)
    kept = [b for b, k in zip(blocks, keep) if k]
    if not kept:
        return ExtractResult("", [], FailureCode.NO_CONTENT,
                             n_blocks_total=len(blocks))
    text = "\n\n".join(b.text() for b in kept)
    spans = [(b.start, b.end) for b in kept]
    return ExtractResult(text, spans, FailureCode.OK,
                         n_blocks_total=len(blocks), n_blocks_kept=len(kept))


def _extract_pdf(payload: bytes) -> ExtractResult:
    pos = len(PDF_MAGIC)
    parts: list[str] = []
    spans: list = []
    n_total = 0
    while True:
        if pos + 5 > len(payload):
            return ExtractResult("\n\n".join(parts), spans,
                                 FailureCode.PDF_TRUNCATED,
                                 n_blocks_total=n_total,
                                 n_blocks_kept=len(parts), content_kind="pdf")
        kind = payload[pos]
        length = int.from_bytes(payload[pos + 1:pos + 5], "big")
        pos += 5
        if length == 0:
            break
        if pos + length > len(payload):
            return ExtractResult("\n\n".join(parts), spans,
                                 FailureCode.PDF_TRUNCATED,
                                 n_blocks_total=n_total,
                                 n_blocks_kept=len(parts), content_kind="pdf")
        n_total += 1
        if kind == 0:
            try:
                block_text = payload[pos:pos + length].decode("utf-8")
            except UnicodeDecodeError:
                return ExtractResult("\n\n".join(parts), spans,
                                     FailureCode.ENCODING,
                                     n_blocks_total=n_total,
                                     n_blocks_kept=len(parts),
                                     content_kind="pdf")
            norm = _WS_RE.sub(" ", block_text).strip()
            if norm:
                parts.append(norm)
                spans.append((pos, pos + length))
        pos += length
    if not parts:
        return ExtractResult("", [], FailureCode.NO_CONTENT,
                             n_blocks_total=n_total, content_kind="pdf")
    return ExtractResult("\n\n".join(parts), spans, FailureCode.OK,
                         n_blocks_total=n_total, n_blocks_kept=len(parts),
                         content_kind="pdf")


def extract_page(html: bytes | None, pre_text: str | None = None) -> ExtractResult:
    """Extract main content from one page payload.

    ``html`` is the raw binary payload (UTF-8 HTML, or the synthetic PDF-ish
    container, per FIXTURES.md §1). ``pre_text`` is the pages table's
    pre-extracted ``text`` column — used only when the binary payload is
    absent (the pipeline "must prefer extracting from html", FIXTURES.md).
    """
    if html is None or len(html) == 0:
        if pre_text:
            norm = _WS_RE.sub(" ", pre_text).strip()
            return ExtractResult(norm, [(0, len(pre_text))], FailureCode.OK,
                                 n_blocks_total=1, n_blocks_kept=1,
                                 content_kind="text")
        return ExtractResult("", [], FailureCode.EMPTY)
    if html.startswith(PDF_MAGIC):
        return _extract_pdf(html)
    if html[:5] in (b"%SPDF", b"%PDF-"):
        return ExtractResult("", [], FailureCode.PDF_BAD_MAGIC,
                             content_kind="pdf")
    try:
        source = html.decode("utf-8")
        failure = FailureCode.OK
    except UnicodeDecodeError:
        source = html.decode("utf-8", errors="replace")
        failure = FailureCode.ENCODING
    res = _extract_html(source)
    if failure and res.failure_code == FailureCode.OK:
        # extraction succeeded on the replaced text; keep the encoding flag
        res = ExtractResult(res.text, res.spans, failure,
                            res.n_blocks_total, res.n_blocks_kept,
                            res.content_kind)
    return res


__all__ = ["extract_page", "ExtractResult", "FailureCode", "PDF_MAGIC"]
