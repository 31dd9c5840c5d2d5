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


def repetition_signals(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style within-document repetition signals, one row per
    document: (id, n_tokens, distinct_token_frac, top_bigram_frac,
    dup_trigram_frac). Public heuristics per Rae et al., "Scaling
    Language Models: ... Gopher" (2021) §A1.1 (fraction of duplicated
    n-grams / top-n-gram mass) — repetition-heavy documents are
    low-quality training text even when no other document duplicates
    them (the cross-document case is ``duplicated_spans``).

    * distinct_token_frac: distinct / total tokens
    * top_bigram_frac: occurrences of the most frequent bigram over
      all bigram positions (0.0 when the doc has < 2 tokens)
    * dup_trigram_frac: fraction of trigram positions whose trigram
      occurs >= 2 times in the document (0.0 when < 3 tokens)

    Explode + two hash aggregations, all whole-stage codegen; shuffle
    rows are (id, gram-hash) pairs. Fractions rounded to 4 so the
    DuckDB oracle hash-matches.
    """
    from pyspark.sql import DataFrame  # noqa: F401 (signature doc)
    from pyspark.sql import Window as W

    from distributed_stream_processing_spark.functions.text import md5_hash60

    toks = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.posexplode(raw_tokens(text_col)).alias("pos", "tok"),
    )
    wlead = W.partitionBy("id").orderBy("pos")
    grams = toks.select(
        "id",
        md5_hash60(
            F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(wlead))
        ).alias("bg"),
        F.lead("tok", 1).over(wlead).isNotNull().alias("has_bg"),
        md5_hash60(
            F.concat_ws(
                " ",
                F.col("tok"),
                F.lead("tok", 1).over(wlead),
                F.lead("tok", 2).over(wlead),
            )
        ).alias("tg"),
        F.lead("tok", 2).over(wlead).isNotNull().alias("has_tg"),
    )
    tok_stats = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct"),
    )
    bg_stats = (
        grams.filter("has_bg")
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("n_bg"))
    )
    tg_stats = (
        grams.filter("has_tg")
        .groupBy("id", "tg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias(
                "dup_tg"
            ),
            F.sum("c").alias("n_tg"),
        )
    )
    return (
        tok_stats.join(bg_stats, "id", "left")
        .join(tg_stats, "id", "left")
        .select(
            "id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "distinct_token_frac"
            ),
            F.round(
                F.coalesce(F.col("top_bg") / F.col("n_bg"), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("dup_tg") / F.col("n_tg"), F.lit(0.0)), 4
            ).alias("dup_trigram_frac"),
        )
    )
