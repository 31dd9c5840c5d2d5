"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting. All built-in-function expressions
(codegen'd) with exactly mirrored DuckDB SQL for the oracle gate.

Ratios are single double divisions of exact integers, so they are
bit-identical across engines; composite scores reuse those ratios
with literal weights.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# function-word lists for the n-gram/stopword language heuristic.
# Deterministic toy lists (the corpus is synthetic); the operator
# shape (per-language hit counts -> argmax) is the real deliverable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "una", "que"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}

# BPE-ish word/number/symbol segmentation used by token counting.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def raw_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != "")


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(raw_tokens(text)).cast("bigint")


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish token count: words / numbers / single symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)).cast("bigint")


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Number of tokens (with repeats) in the language's stopword list."""
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(raw_tokens(text), lambda t: F.lower(t).isin(*words))
    ).cast("bigint")


def lang_guess(text: Column | str) -> Column:
    """argmax of per-language stopword hit rates; 'und' (undetermined)
    when nothing hits. Ties break by language code order."""
    hits = [(lang, stopword_hits(text, lang)) for lang in sorted(LANG_STOPWORDS)]
    best = F.greatest(*[h for _, h in hits])
    out = F.lit("und")
    for lang, h in reversed(hits):  # earlier langs win ties -> apply last
        out = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.length(c)


def mean_word_len(text: Column | str) -> Column:
    toks = raw_tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return total / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: length factor + stopword presence
    - punctuation excess. Mirrors C4/Gopher-style rule scoring."""
    n_tok = ws_token_count(text)
    len_factor = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_factor = F.least(stopword_hits(text, "en") / F.lit(5.0), F.lit(1.0))
    return F.round(
        0.5 * len_factor + 0.3 * stop_factor + 0.2 * (1.0 - punct_ratio(text)), 6
    )
