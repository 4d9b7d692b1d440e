"""Text-analysis kernels for the documents table: token counting, quality
scoring, n-gram language ID, md5 fingerprinting.

Every function is deliberately expressible in ANSI SQL (regexp-based), so
the Ray pipelines built on them have strong DuckDB oracles; the SQL strings
live next to the queries in __ray_entry__.py and MUST stay in lockstep with
these definitions.
"""

from __future__ import annotations

import hashlib
import re

# re.ASCII: these kernels' oracles run on DuckDB's RE2, whose \S and \b
# are ASCII-only; Python's default Unicode-aware \b/\S would diverge on
# non-ASCII text (e.g. 'thé', NBSP) — the ASCII flag makes both engines
# (and the pc.count_substring_regex vectorized path in stages/text.py)
# agree on arbitrary input, fuzz-pinned in tests/test_sketch_sql_fuzz.py.
_TOKEN = re.compile(r"\S+", re.ASCII)
_NON_ALPHA_SPACE = re.compile(r"[^a-zA-Z ]")

# language marker words (n-gram heuristic): counts of these decide the
# predicted language with a fixed >= cascade (en, de, fr, es) and
# "unknown" when nothing matches
_LANG_MARKERS = {
    "en": re.compile(r"\b(the|and|of|to|in)\b", re.ASCII),
    "de": re.compile(r"\b(der|die|das|und|ist)\b", re.ASCII),
    "fr": re.compile(r"\b(le|la|les|et|est)\b", re.ASCII),
    "es": re.compile(r"\b(el|los|las|es|y)\b", re.ASCII),
}
_STOPWORDS = _LANG_MARKERS["en"]


def token_count(text: str) -> int:
    return len(_TOKEN.findall(text))


def alpha_ratio(text: str) -> float:
    """Share of [a-zA-Z ] characters; 0.0 for empty text."""
    if not text:
        return 0.0
    return len(_NON_ALPHA_SPACE.sub("", text)) / len(text)


def stopword_ratio(text: str) -> float:
    """English stopword hits per token; 0.0 when tokenless."""
    n = token_count(text)
    if n == 0:
        return 0.0
    return len(_STOPWORDS.findall(text)) / n


def lang_scores(text: str) -> dict[str, int]:
    return {lang: len(rx.findall(text)) for lang, rx in _LANG_MARKERS.items()}


def predict_lang(text: str) -> str:
    s = lang_scores(text)
    if s["en"] == 0 and s["de"] == 0 and s["fr"] == 0 and s["es"] == 0:
        return "unknown"
    if s["en"] >= s["de"] and s["en"] >= s["fr"] and s["en"] >= s["es"]:
        return "en"
    if s["de"] >= s["fr"] and s["de"] >= s["es"]:
        return "de"
    if s["fr"] >= s["es"]:
        return "fr"
    return "es"


def fingerprint(text: str) -> str:
    """md5 hex digest of the UTF-8 bytes (equals DuckDB ``md5(text)``)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()
