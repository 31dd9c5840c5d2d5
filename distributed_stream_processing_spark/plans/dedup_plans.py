"""Dedup + text-analysis queries (training-data pipeline operators)."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.text import tokens
from distributed_stream_processing_spark.functions.text_analysis import (
    LANG_STOPWORDS,
    TOKEN_REGEX,
    lang_guess,
    mean_word_len,
    punct_ratio,
    quality_score,
    regex_token_count,
    ws_token_count,
)
from distributed_stream_processing_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_dedup,
    simhash_near_pairs,
)
from distributed_stream_processing_spark.plans.registry import query


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))


@query(
    "q20_dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized-text fingerprint.",
)
def q20_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(Catalog(spark, sf_dir).documents)


@query(
    "q21_dedup_minhash_lsh",
    oracle=None,  # LSH recall is probabilistic; pytest checks recall vs brute force
    doc=(
        "MinHash(64)+LSH(16 bands) candidate generation, exact-Jaccard "
        "verified at t=0.8 — the scalable near-dup path (output is a "
        "subset of q16's brute-force-equal result)."
    ),
)
def q21_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_dedup(_doc_tokens(spark, sf_dir), Fraction(4, 5))


@query(
    "q22_dedup_simhash",
    oracle=None,  # depends on xxhash64, not reproducible in DuckDB
    doc="SimHash64 near-dup pairs at hamming<=3 via 4x16-bit band join.",
)
def q22_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(_doc_tokens(spark, sf_dir), max_hamming=3)


def _duck_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        "len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), "
        f"x -> lower(x) IN ({words})))"
    )


@query(
    "q23_token_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS seq
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(seq) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS bpe_tokens,
           CAST(len(list_distinct(seq)) AS BIGINT) AS distinct_tokens,
           round(list_aggregate(list_transform(seq, x -> len(x)), 'sum') / len(seq), 6)
             AS mean_word_len
    FROM toks
    """,
    doc="Token counting: whitespace, BPE-ish regex, distinct, mean length.",
)
def q23_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        ws_token_count("text").alias("ws_tokens"),
        regex_token_count("text").alias("bpe_tokens"),
        F.size(tokens("text")).cast("bigint").alias("distinct_tokens"),
        F.round(mean_word_len("text"), 6).alias("mean_word_len"),
    )


@query(
    "q24_lang_guess",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id,
             {_duck_stop_hits('de')} AS h_de,
             {_duck_stop_hits('en')} AS h_en,
             {_duck_stop_hits('es')} AS h_es,
             {_duck_stop_hits('fr')} AS h_fr,
             {_duck_stop_hits('zh')} AS h_zh
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CASE
             WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
             WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
             WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
             WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
             WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
             ELSE 'zh'
           END AS lang_guess
    FROM hits
    """,
    doc="Language ID via stopword-hit argmax (n-gram heuristic family).",
)
def q24_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        lang_guess("text").alias("lang_guess"),
    )


@query(
    "q25_quality_score",
    oracle="""
    WITH parts AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
             len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
                 x -> lower(x) IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'that')))
               AS stop_hits,
             (len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / len(text)
               AS punct_ratio
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           round(0.5 * least(n_tok / 50.0, 1.0)
               + 0.3 * least(stop_hits / 5.0, 1.0)
               + 0.2 * (1.0 - punct_ratio), 6) AS quality
    FROM parts
    """,
    doc="Rule-based quality score (length, stopword, punctuation factors).",
)
def q25_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        quality_score("text").alias("quality"),
    )


@query(
    "q52_content_flags",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           CAST(len(regexp_extract_all(text, '\\b[A-Z][a-z]+')) AS BIGINT) AS n_capitalized,
           CAST(CASE WHEN regexp_matches(text, 'https?://') THEN 1 ELSE 0 END AS BIGINT) AS has_url,
           CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentence_punct
    FROM documents
    """,
    doc=(
        "Regex content-flag profiling (curation filters): numeric-token "
        "count, capitalized words, URL presence, sentence punctuation — "
        "all JVM-side regexp_extract_all."
    ),
)
def q52_content_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("bigint").alias("n_numbers"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b[A-Z][a-z]+"), 0)).cast("bigint").alias("n_capitalized"),
        F.when(F.col("text").rlike("https?://"), 1).otherwise(0).cast("bigint").alias("has_url"),
        F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0)).cast("bigint").alias("n_sentence_punct"),
    )


@query(
    "q47_winnowing_candidates",
    oracle=None,  # xxhash-based; shift-robustness checked by pytest
    doc=(
        "Winnowing rolling-hash fingerprints (k-gram window minima): "
        "near-dup candidate pairs sharing >= 5 fingerprints — the "
        "shift-robust dedup primitive (vs q19's whole-doc md5)."
    ),
)
def q47_winnowing_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributed_stream_processing_spark.functions.text import (
        winnow_fingerprints,
    )

    docs = Catalog(spark, sf_dir).documents
    # materialize once: the fingerprint expression is reused by the
    # frequency filter and both join sides
    fp = docs.select(
        F.col("doc_id").cast("bigint").alias("id"),
        F.explode(winnow_fingerprints("text")).alias("fp"),
    ).localCheckpoint(eager=True)
    # stop-shingle removal: fingerprints in >5% of docs carry no
    # discriminative signal and would make the join quadratic
    n_docs = docs.count()
    rare = fp.groupBy("fp").count().filter(F.col("count") <= 0.05 * n_docs)
    fp = fp.join(F.broadcast(rare.select("fp")), "fp")
    a = fp.selectExpr("id a_id", "fp")
    b = fp.selectExpr("id b_id", "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= 5)
    )
