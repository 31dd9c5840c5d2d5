"""Facade smoke tests: every capability reachable from Engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def test_stream_join(eng, spark, sf_smoke):
    cat = Catalog(spark, sf_smoke)
    stream = cat.lineitem.select(
        F.col("l_orderkey").cast("bigint").alias("okey"),
        F.col("l_partkey").cast("bigint").alias("pk"),
    )
    store = cat.part.select(
        F.col("p_partkey").cast("bigint").alias("pk"), "p_retailprice"
    )
    out = eng.stream_join(stream, store, key="pk", n_batches=2)
    assert out.count() == stream.count()
    assert set(out.columns) == {"okey", "pk", "p_retailprice"}
    # admission control must actually reach the join (it was once a
    # silent no-op) while staying cache-transparent
    gated = eng.stream_join(
        stream, store, key="pk", n_batches=2, admit_below_freq=1
    )
    assert gated.count() == stream.count()


def test_similarity_join_methods_agree(eng, spark, sf_smoke):
    docs = Catalog(spark, sf_smoke).documents.limit(80)
    tok = eng.tokenize(docs, "doc_id", "text")
    a = {tuple(r) for r in eng.similarity_join(tok, threshold=0.8).collect()}
    b = {tuple(r) for r in eng.similarity_join(tok, threshold=0.8, method="brute").collect()}
    assert a == b


def test_subsequence_match_dispatch(eng, spark, sf_smoke):
    from distributed_stream_processing_spark.plans.timeseries_plans import series_df

    s = series_df(spark, sf_smoke)
    q = [r.value for r in s.filter(F.col("pos") < 50).orderBy("pos").collect()]
    ed = eng.subsequence_match(s, q, epsilon=1.0, measure="ED", widths=(25, 50))
    assert {r.start for r in ed.collect()} == {0}
    with pytest.raises(ValueError):
        eng.subsequence_match(s, q, epsilon=1.0, measure="nope")


def test_dedup_dispatch(eng, spark, sf_smoke):
    docs = Catalog(spark, sf_smoke).documents.limit(60)
    assert eng.dedup(docs, method="exact").count() == 60
    assert eng.dedup(docs, method="minhash").count() >= 0
    assert eng.dedup(docs, method="simhash").count() >= 0


def test_ann_dispatch(eng, spark, sf_smoke):
    emb = Catalog(spark, sf_smoke).embeddings
    q = emb.filter(F.col("vec_id") < 3)
    out = eng.ann_search(q, emb, k=3)
    assert out.groupBy("q_id").count().filter("count != 3").count() == 0


def test_save_load_roundtrip(eng, spark, sf_smoke, tmp_path):
    docs = Catalog(spark, sf_smoke).documents.select("doc_id", "lang", "n_chars")
    p = str(tmp_path / "out_parquet")
    eng.save(docs, p, partition_by=["lang"])
    back = eng.load(p)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    c = str(tmp_path / "out_csv")
    eng.save(docs, c, fmt="csv")
    back_csv = eng.load(c, fmt="csv")
    assert back_csv.count() == docs.count()


def test_engine_dedup_clusters_exact_and_minhash(spark, sf_smoke):
    from distributed_stream_processing_spark.catalog import Catalog
    from distributed_stream_processing_spark.engine import Engine

    eng = Engine(spark)
    docs = Catalog(spark, sf_smoke).documents
    for method in ("exact", "minhash"):
        out = eng.dedup_clusters(docs, method=method)
        rows = out.collect()
        assert set(out.columns) == {"id", "cluster_id", "keep"}
        assert len(rows) == docs.count()  # every doc labeled
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            # representative is the min id and the only keep=True
            assert min(m.id for m in members) == cid
            assert sum(1 for m in members if m.keep) == 1


def test_ann_kwargs_validated(eng, spark, sf_smoke):
    emb = Catalog(spark, sf_smoke).embeddings
    q = emb.filter(F.col("vec_id") < 2)
    # tuning an ivf call then switching to brute must raise a CLEAR
    # argument error naming the method and parameter (ADVICE r6), not
    # an opaque TypeError from the function internals
    with pytest.raises(TypeError, match="brute.*n_probe"):
        eng.ann_search(q, emb, k=2, method="brute", n_probe=4)
    with pytest.raises(TypeError, match="lsh.*n_centroids"):
        eng.ann_search(q, emb, k=2, method="lsh", n_centroids=8)
    with pytest.raises(ValueError, match="unknown ann method"):
        eng.ann_search(q, emb, k=2, method="annoy")
    # valid per-method kwargs still pass through
    out = eng.ann_search(q, emb, k=2, method="lsh", n_planes=6, multiprobe=2)
    assert out.count() >= 0


def test_engine_duplicated_spans(eng, spark, sf_smoke):
    docs = Catalog(spark, sf_smoke).documents
    out = eng.duplicated_spans(docs, k=5)
    assert set(out.columns) == {"id", "span_start", "span_end", "n_grams"}
    for r in out.collect():
        assert r.span_end >= r.span_start
        assert r.n_grams == r.span_end - r.span_start + 1


def test_engine_repetition_signals(eng, spark, sf_smoke):
    docs = Catalog(spark, sf_smoke).documents
    out = eng.repetition_signals(docs)
    assert set(out.columns) == {
        "id", "n_tokens", "distinct_token_frac",
        "top_bigram_frac", "dup_trigram_frac",
    }
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.distinct_token_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0


def test_engine_multimodal_pipeline(eng, spark, sf_smoke):
    """decode_media / frame_sample / resize_plan via the facade —
    the whole multimodal surface reachable from one Engine object."""
    from distributed_stream_processing_spark.sources.multimodal import (
        media_table,
    )

    media = media_table(spark, sf_smoke)
    decoded = eng.decode_media(media)
    assert {"media_id", "media_type", "width", "height", "feature"} <= set(
        decoded.columns
    )
    n = decoded.count()
    assert n == 500
    frames = eng.frame_sample(decoded, every_n=4)
    assert frames.filter("frame_no % 4 != 0").count() == 0
    rs = eng.resize_plan(decoded, max_dim=64)
    bad = rs.filter("new_width > 64 OR new_height > 64").count()
    assert bad == 0
    # non-image rows are excluded from the resize plan
    assert rs.filter("media_type NOT LIKE 'image/%'").count() == 0


def test_engine_text_profile(eng, spark, sf_smoke):
    docs = Catalog(spark, sf_smoke).documents
    out = eng.text_profile(docs)
    assert set(out.columns) == {
        "doc_id", "lang_guess", "quality_score", "ws_tokens", "regex_tokens",
    }
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r.ws_tokens >= 0 and r.regex_tokens >= 0
        assert 0.0 <= r.quality_score <= 1.0
