"""Pinned fuzzy string ratios (stdlib difflib; deterministic).

The reference mixes two rapidfuzz ratios: ``fuzz.ratio`` for the last-name
reduce (apertus_ner_chunk.py:111) and ``fuzz.token_sort_ratio`` for
gazetteer candidate filtering (apertus_ner_chunk.py:174). We preserve the
distinction but pin ONE implementation (SURVEY §7 hard part 4): the classic
SequenceMatcher-based formula ``100 * 2*M / (len(a)+len(b))`` rounded to the
nearest int, with the standard full_process normalization (lowercase, strip
non-alphanumeric runs to single spaces).

Thresholds mirror the reference: FUZZ=85 for linking (env-tunable default,
apertus_ner_chunk.py:27) and 85 for the single-name reduce
(group_and_reduce_entities' threshold=85 default, apertus_ner_chunk.py:100).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

FUZZ_THRESHOLD = 85
FUZZ_SINGLE_THRESHOLD = 85

_NON_ALNUM_RE = re.compile(r"[^\w]+", re.UNICODE)


def full_process(s: str) -> str:
    return _NON_ALNUM_RE.sub(" ", s.lower()).strip()


def ratio(a: str, b: str) -> int:
    """SequenceMatcher similarity ×100. NOT symmetric in edge cases
    (difflib matches relative to the first argument) — call sites pin the
    order as ratio(query/mention, candidate), which keeps linking
    deterministic; see tests/test_properties.py."""
    a, b = full_process(a), full_process(b)
    if not a and not b:
        return 100
    if not a or not b:
        return 0
    m = SequenceMatcher(None, a, b, autojunk=False)
    matches = sum(tr.size for tr in m.get_matching_blocks())
    return int(round(200.0 * matches / (len(a) + len(b))))


def sort_tokens(s: str) -> str:
    """full_process + token sort — the precomputable half of
    token_sort_ratio (gazetteer names are normalized once at index build,
    not once per comparison)."""
    return " ".join(sorted(full_process(s).split()))


def ratio_presorted(a_sorted: str, b_sorted: str,
                    min_score: int = 0) -> int:
    """ratio() on already-normalized strings, with two exact-semantics
    fast paths: equality → 100, and a length upper bound
    (matches ≤ min(len)) that skips SequenceMatcher when the best
    possible score is below ``min_score``."""
    if a_sorted == b_sorted:
        return 100
    la, lb = len(a_sorted), len(b_sorted)
    if not la or not lb:
        return 0
    upper = int(round(200.0 * min(la, lb) / (la + lb)))
    if upper < min_score:
        return 0
    m = SequenceMatcher(None, a_sorted, b_sorted, autojunk=False)
    matches = sum(tr.size for tr in m.get_matching_blocks())
    return int(round(200.0 * matches / (la + lb)))


def char_bag(s: str) -> dict:
    """Character multiset of ``s`` as a plain dict (precomputable)."""
    d: dict = {}
    for ch in s:
        d[ch] = d.get(ch, 0) + 1
    return d


def ratio_presorted_bagged(a_sorted: str, b_sorted: str,
                           a_bag: dict, b_bag: dict,
                           min_score: int = 0) -> int:
    """``ratio_presorted`` with one more decision-exact prune: matched
    characters form an injective pairing, so matches ≤ the character
    multiset intersection — if even that upper bound rounds below
    ``min_score``, SequenceMatcher cannot reach the threshold and the
    call returns 0 without running it (call sites discard sub-threshold
    scores, so 0 is decision-equivalent). The bags are precomputable at
    index build, which is what makes this cheaper than the matcher."""
    if a_sorted == b_sorted:
        return 100
    la, lb = len(a_sorted), len(b_sorted)
    if not la or not lb:
        return 0
    denom = la + lb
    if int(round(200.0 * (la if la < lb else lb) / denom)) < min_score:
        return 0
    small, big = (a_bag, b_bag) if la < lb else (b_bag, a_bag)
    inter = 0
    for ch, c in small.items():
        oc = big.get(ch)
        if oc:
            inter += c if c <= oc else oc
    if int(round(200.0 * inter / denom)) < min_score:
        return 0
    m = SequenceMatcher(None, a_sorted, b_sorted, autojunk=False)
    matches = sum(tr.size for tr in m.get_matching_blocks())
    return int(round(200.0 * matches / denom))


def token_sort_ratio(a: str, b: str) -> int:
    return ratio_presorted(sort_tokens(a), sort_tokens(b))


__all__ = ["ratio", "token_sort_ratio", "full_process", "sort_tokens",
           "ratio_presorted", "ratio_presorted_bagged", "char_bag",
           "FUZZ_THRESHOLD", "FUZZ_SINGLE_THRESHOLD"]
