"""Pure-Python deterministic extraction semantics (the oracle).

Everything in this subpackage is stdlib-only, dependency-pinned, and
deterministic: the Spark stages in ``pipeline/`` call these functions inside
Arrow-batched UDFs, and the pytest suite calls them single-threaded over the
same corpus — byte-identical extracted text per url is the contract
(BASELINE.json north_rule).
"""

from .core import extract_page, ExtractResult, FailureCode  # noqa: F401
