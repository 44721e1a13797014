"""Deterministic tokenizer, sentence splitter, and language ID.

Replaces the reference's model-backed text processing with pinned,
dependency-free rules (north rule: no model inference):

- tokenizer       ~ HF tokenizer call  (lora_chunking_api.py:259-266)
- sentence split  ~ stanza 'tokenize'  (lora_chunking_api.py:274-276)
- language id     ~ stanza langid      (lora_chunking_api.py:136-140)

All pure functions over str — used identically inside Spark Arrow UDFs and
in pytest, so parity holds by construction.
"""

from __future__ import annotations

import re

# BPE-ish word/punct tokenizer: word = letters/digits/underscore runs
# (unicode-aware), every other non-space char is its own token.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

# Sentence boundary: terminal punctuation, optional closing quotes/brackets,
# whitespace, then an upper-case letter / digit / opening quote.
_SENT_BOUNDARY_RE = re.compile(
    r"(?<=[.!?])[\"')\]]*\s+(?=[\"'(\[]?[A-ZÄÖÜÀÉÈ0-9])"
)
_PARA_RE = re.compile(r"\n{2,}")

# Common abbreviations that should NOT end a sentence (de/fr/it/en mix,
# mirrors the multilingual corpus of the reference).
_ABBREVS = frozenset(
    {"dr", "prof", "mr", "mrs", "ms", "st", "nr", "no", "art", "abs", "vgl",
     "z.b", "bzw", "usw", "etc", "ca", "inkl", "evtl", "ggf", "mme", "mlle",
     "sig", "ing", "vol", "pp", "ed", "eds", "fig", "jr", "sr"}
)


def tokenize(text: str) -> list[str]:
    """Deterministic word/punct tokens (the unit of the 512 chunk budget)."""
    return _TOKEN_RE.findall(text)


def token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


def token_spans(text: str) -> list[tuple[str, int, int]]:
    """Tokens with (start, end) char offsets."""
    return [(m.group(0), m.start(), m.end())
            for m in _TOKEN_RE.finditer(text)]


def _fix_abbrev_splits(parts: list[str]) -> list[str]:
    """Re-join splits made right after a known abbreviation."""
    out: list[str] = []
    for part in parts:
        if out:
            prev = out[-1].rstrip()
            m = re.search(r"(\w[\w.]*)\.$", prev)
            if m and m.group(1).lower().rstrip(".") in _ABBREVS:
                out[-1] = out[-1] + " " + part
                continue
        out.append(part)
    return out


def split_sentences(text: str) -> list[tuple[str, bool]]:
    """Split into sentences; returns [(sentence, starts_paragraph)].

    Paragraph boundaries (blank lines — the extractor joins blocks with
    "\\n\\n") always split and are flagged: the deterministic chunker breaks
    on them in place of the reference's embedding-similarity breakpoints
    (lora_chunking_api.py:212-241, threshold 0.89).
    """
    sentences: list[tuple[str, bool]] = []
    for para in _PARA_RE.split(text):
        para = para.strip()
        if not para:
            continue
        parts = _SENT_BOUNDARY_RE.split(para)
        parts = _fix_abbrev_splits(parts)
        first = True
        for s in parts:
            s = s.strip()
            if s:
                sentences.append((s, first))
                first = False
    return sentences


# --- language ID: stopword-profile heuristic -------------------------------
# Tiny pinned stopword lists; score = fraction of tokens that are stopwords
# of each language; ties broken by fixed language order (de, fr, it, en).

_STOPWORDS = {
    "de": frozenset(
        "der die das und ist ein eine nicht mit von zu im den des dem auf "
        "für als auch sich bei aus nach wird sind oder wurde über".split()),
    "fr": frozenset(
        "le la les et est une un ne pas avec de du des au aux dans pour "
        "que qui sur par plus se ce cette mais été sont".split()),
    "it": frozenset(
        "il la le e è un una non con di del della dei nel per che chi su "
        "da più si questo questa ma sono stato anche".split()),
    "en": frozenset(
        "the and is a an not with of to in for as also at from will are "
        "or was over on by this that but been have".split()),
}
_LANG_ORDER = ("de", "fr", "it", "en")


def detect_lang(text: str) -> str:
    return detect_lang_tokens(tokenize(text))


def detect_lang_tokens(tokens: list[str]) -> str:
    """detect_lang over a pre-tokenized text (single tokenize pass shared
    with token counting in the extraction UDF)."""
    toks = [t.lower() for t in tokens if t.isalpha()]
    if not toks:
        return "und"
    best_lang, best_score = "und", 0.0
    for lang in _LANG_ORDER:
        sw = _STOPWORDS[lang]
        score = sum(1 for t in toks if t in sw) / len(toks)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.02 else "und"


__all__ = ["tokenize", "token_count", "token_spans", "split_sentences",
           "detect_lang", "detect_lang_tokens"]
