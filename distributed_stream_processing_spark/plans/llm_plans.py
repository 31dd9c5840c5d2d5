"""Span-level dedup + repetition-quality signals (LLM-pipeline ops).

Round-6 additions beyond the reference's record-granularity
pipelines: locating duplicated SPANS across documents (Lee et al.,
ACL'22 — templated/boilerplate passages repeat across otherwise
distinct documents) and Gopher-style within-document repetition
signals (Rae et al., 2021).

The driver's correctness card holds the FIRST 50 registered queries;
round 7 retired four subsumed relational slices (q03/q04/q05/q08) so
the whole registry is exactly 50 rows and these land on the card
(tests/test_registry_window.py pins the budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.text import duck_md5_hash60
from distributed_stream_processing_spark.plans.registry import query

_K = 5  # span k-gram width


def _toks_cte() -> str:
    """Shared DuckDB CTEs: ordered token stream + lead windows (the
    twin of the engine's posexplode + lead() gram assembly)."""
    return """
    seq AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents),
    tok AS (SELECT doc_id,
                   unnest(range(1, len(toks) + 1)) AS pos,
                   unnest(toks) AS tok
            FROM seq),
    w AS (SELECT doc_id, pos, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                 lead(tok, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS t3,
                 lead(tok, 4) OVER (PARTITION BY doc_id ORDER BY pos) AS t4
          FROM tok)
    """


@query(
    "q57_dedup_spans",
    oracle=f"""
    WITH {_toks_cte()},
    grams AS (
      SELECT doc_id, pos - 1 AS pos,
             {duck_md5_hash60("concat_ws(' ', tok, t1, t2, t3, t4)")} AS gh
      FROM w WHERE t4 IS NOT NULL
    ),
    dup AS (SELECT gh FROM grams GROUP BY gh
            HAVING count(DISTINCT doc_id) >= 2),
    dp AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)),
    runs AS (SELECT doc_id, pos,
                    pos - row_number() OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS grp
             FROM dp)
    SELECT CAST(doc_id AS BIGINT) AS id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM runs GROUP BY doc_id, grp
    """,
    doc=(
        "Exact substring-span dedup: maximal runs of token positions "
        "whose 5-grams appear in >= 2 distinct documents — the "
        "span-granularity dedup step of a training pipeline (k-gram "
        "inverted postings re-expressing Lee et al.'s suffix-array "
        "technique as distributed shuffles). Oracle = identical gram "
        "hashing + run grouping in DuckDB."
    ),
)
def q57_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributed_stream_processing_spark.operators.dedup import (
        duplicated_spans,
    )

    return duplicated_spans(Catalog(spark, sf_dir).documents, k=_K)


@query(
    "q58_repetition_signals",
    oracle=f"""
    WITH {_toks_cte()},
    tok_stats AS (SELECT doc_id, count(*) AS n_tokens,
                         count(DISTINCT tok) AS n_distinct
                  FROM tok GROUP BY doc_id),
    bg AS (SELECT doc_id,
                  {duck_md5_hash60("concat_ws(' ', tok, t1)")} AS g
           FROM w WHERE t1 IS NOT NULL),
    bstat AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM
                (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
              GROUP BY doc_id),
    tg AS (SELECT doc_id,
                  {duck_md5_hash60("concat_ws(' ', tok, t1, t2)")} AS g
           FROM w WHERE t2 IS NOT NULL),
    tstat AS (SELECT doc_id,
                     sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_tg,
                     sum(c) AS n_tg FROM
                (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2)
              GROUP BY doc_id)
    SELECT CAST(t.doc_id AS BIGINT) AS id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           round(t.n_distinct / t.n_tokens, 4) AS distinct_token_frac,
           round(coalesce(b.top_bg / b.n_bg, 0.0), 4) AS top_bigram_frac,
           round(coalesce(g.dup_tg / g.n_tg, 0.0), 4) AS dup_trigram_frac
    FROM tok_stats t
    LEFT JOIN bstat b USING (doc_id)
    LEFT JOIN tstat g USING (doc_id)
    """,
    doc=(
        "Gopher-style within-document repetition signals: distinct-"
        "token fraction, top-bigram mass, duplicated-trigram "
        "fraction (Rae et al. 2021 §A1.1 heuristics) — repetition-"
        "heavy docs are low-quality training text even when no other "
        "document duplicates them."
    ),
)
def q58_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributed_stream_processing_spark.functions.text_analysis import (
        repetition_signals,
    )

    return repetition_signals(Catalog(spark, sf_dir).documents)
