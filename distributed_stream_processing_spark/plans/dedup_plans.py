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
    _MERSENNE_P,
    _perm_params,
    exact_dedup_groups,
    minhash_lsh_dedup,
    simhash_near_pairs,
)
from distributed_stream_processing_spark.plans.registry import query

_DUCK_TOKENS = (
    "list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))"
)


def _duck_minhash_oracle(threshold: Fraction, num_perm: int, bands: int, seed: int) -> str:
    """DuckDB twin of minhash_lsh_dedup: identical md5-derived token
    hashes, the same 64 (a,b) permutations as literals, band keys as
    raw value strings (the Spark side hashes the same strings — equal
    strings => equal buckets), then the same exact-Jaccard verify."""
    p = _MERSENNE_P
    r = num_perm // bands
    mins = ",\n             ".join(
        f"list_aggregate(list_transform(h, x -> ({a} * x + {b}) % {p}), 'min')"
        for a, b in _perm_params(num_perm, seed)
    )
    t = threshold
    return f"""
    WITH toks AS (
      SELECT doc_id AS id, {_DUCK_TOKENS} AS tokens FROM documents
    ), th AS (
      SELECT id, tokens,
             list_transform(tokens,
               t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % {p}) AS h
      FROM toks
    ), sig AS (
      SELECT id, tokens,
             [{mins}] AS mh
      FROM th
    ), banded AS (
      SELECT id, tokens, band,
             array_to_string(mh[band * {r} + 1 : band * {r} + {r}], ',') AS bkey
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band)
    ), cand AS (
      SELECT DISTINCT a.id AS a_id, b.id AS b_id
      FROM banded a JOIN banded b USING (band, bkey)
      WHERE a.id < b.id
    ), ver AS (
      SELECT a_id, b_id,
             len(list_intersect(ta.tokens, tb.tokens)) AS inter,
             len(ta.tokens) + len(tb.tokens)
               - len(list_intersect(ta.tokens, tb.tokens)) AS uni
      FROM cand
      JOIN toks ta ON ta.id = a_id
      JOIN toks tb ON tb.id = b_id
    )
    SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
           CAST(inter AS BIGINT) AS inter, CAST(uni AS BIGINT) AS uni
    FROM ver WHERE {t.denominator} * inter >= {t.numerator} * uni
    """


def _duck_simhash_oracle(max_hamming: int) -> str:
    """DuckDB twin of simhash_near_pairs: the same two md5-derived
    32-bit token hashes, the same per-bit +/-1 votes, the same 4x16-bit
    band join and hamming verify."""

    def half(hcol: str) -> str:
        terms = []
        for i in range(32):
            vote = (
                f"list_aggregate(list_transform({hcol}, "
                f"h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END), 'sum')"
            )
            terms.append(f"CASE WHEN {vote} > 0 THEN {1 << i} ELSE 0 END")
        return " + ".join(terms)

    return f"""
    WITH toks AS (
      SELECT doc_id AS id, {_DUCK_TOKENS} AS tokens FROM documents
    ), th AS (
      SELECT id,
             list_transform(tokens,
               t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS hhi,
             list_transform(tokens,
               t -> CAST(concat('0x', substr(md5(t), 9, 8)) AS BIGINT)) AS hlo
      FROM toks
    ), sig AS (
      SELECT id, ({half("hhi")}) AS sh_hi, ({half("hlo")}) AS sh_lo FROM th
    ), chunks AS (
      SELECT id, sh_hi, sh_lo, 0 AS chunk, sh_lo & 65535 AS val FROM sig
      UNION ALL
      SELECT id, sh_hi, sh_lo, 1, (sh_lo >> 16) & 65535 FROM sig
      UNION ALL
      SELECT id, sh_hi, sh_lo, 2, sh_hi & 65535 FROM sig
      UNION ALL
      SELECT id, sh_hi, sh_lo, 3, (sh_hi >> 16) & 65535 FROM sig
    ), pairs AS (
      SELECT DISTINCT a.id AS a_id, b.id AS b_id,
             bit_count(xor(a.sh_hi, b.sh_hi))
               + bit_count(xor(a.sh_lo, b.sh_lo)) AS hamming
      FROM chunks a JOIN chunks b USING (chunk, val)
      WHERE a.id < b.id
    )
    SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
           CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= {max_hamming}
    """


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # widen the 1-partition fixture scan BEFORE tokenization (r19):
    # only (doc_id, text) rows cross the exchange; a corpus-scale scan
    # passes through untouched (catalog.widen_small_scan)
    docs = cat.widen_small_scan(cat.documents.select("doc_id", "text"))
    return docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("tokens")
    )


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
    oracle=_duck_minhash_oracle(Fraction(4, 5), num_perm=64, bands=16, seed=42),
    doc=(
        "MinHash(64)+LSH(16 bands) candidate generation, exact-Jaccard "
        "verified at t=0.8 — the scalable near-dup path. Token hashes "
        "are md5-derived so the oracle reproduces the exact signatures "
        "and band buckets (hard gate, not just a recall property)."
    ),
)
def q21_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_dedup(_doc_tokens(spark, sf_dir), Fraction(4, 5))


@query(
    "q22_dedup_simhash",
    oracle=_duck_simhash_oracle(max_hamming=3),
    doc=(
        "SimHash64 near-dup pairs at hamming<=3 via 4x16-bit band "
        "join; md5-derived bit votes make the oracle reproduce the "
        "exact signatures."
    ),
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


_DUCK_WINNOW_HASH = "CAST(concat('0x', substr(md5(array_to_string(seq[i : i + 3], ' ')), 1, 15)) AS BIGINT)"


@query(
    "q47_winnowing_candidates",
    oracle=f"""
    WITH seqd AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS seq
      FROM documents
    ), kg AS (
      SELECT doc_id,
             CASE WHEN len(seq) >= 4 THEN
               list_transform(generate_series(1, len(seq) - 3),
                              i -> {_DUCK_WINNOW_HASH})
             ELSE CAST([] AS BIGINT[]) END AS kh
      FROM seqd
    ), wn AS (
      SELECT doc_id,
             CASE WHEN len(kh) >= 5 THEN
               list_distinct(list_transform(generate_series(1, len(kh) - 4),
                                            j -> list_aggregate(kh[j : j + 4], 'min')))
             ELSE list_distinct(kh) END AS fps
      FROM kg
    ), fp AS (
      SELECT doc_id AS id, unnest(fps) AS fp FROM wn
    ), rare AS (
      SELECT fp FROM fp GROUP BY fp
      HAVING 20 * count(*) <= (SELECT count(*) FROM documents)
    ), fr AS (
      SELECT id, f.fp FROM fp f JOIN rare USING (fp)
    )
    SELECT CAST(a.id AS BIGINT) AS a_id, CAST(b.id AS BIGINT) AS b_id,
           CAST(count(*) AS BIGINT) AS shared_fp
    FROM fr a JOIN fr b USING (fp)
    WHERE a.id < b.id
    GROUP BY a.id, b.id
    HAVING count(*) >= 5
    """,
    doc=(
        "Winnowing rolling-hash fingerprints (k=4 shingles, window 5 "
        "minima, Schleimer et al. SIGMOD'03): near-dup candidate pairs "
        "sharing >= 5 fingerprints — the shift-robust dedup primitive. "
        "md5-derived k-gram hashes make the oracle bit-exact."
    ),
)
def q47_winnowing_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributed_stream_processing_spark.functions.text import (
        winnow_fingerprint_rows,
    )

    docs = Catalog(spark, sf_dir).documents
    # materialize once: the fingerprint rows are reused by the
    # frequency filter and both join sides (row form = O(n) hashes per
    # doc; the column form re-hashed per window position)
    fp = winnow_fingerprint_rows(
        docs.select(F.col("doc_id").cast("bigint").alias("doc_id"), "text"),
        "doc_id",
        "text",
    ).localCheckpoint(eager=True)
    # stop-shingle removal: fingerprints in >5% of docs carry no
    # discriminative signal and would make the join quadratic
    # (integer-exact threshold: 20*count <= n_docs <=> count <= 5%)
    n_docs = docs.count()
    rare = fp.groupBy("fp").count().filter(20 * F.col("count") <= F.lit(n_docs))
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
