"""ALS factorization: determinism, quality vs the global-mean
baseline, serving shape, and the item-embedding export surface."""

from __future__ import annotations

import pytest

from datapoints_csv_extractor_spark.operators import factorization as FX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def inter(spark):
    return FX.als_interactions(spark, SF).cache()


@pytest.fixture(scope="module")
def model(inter):
    return FX.train_als(inter)


def test_als_interactions_shape(inter):
    row = inter.first()
    assert set(inter.columns) == {"user", "item", "rating"}
    assert row.rating > 0


def test_als_deterministic_across_fits(inter, model):
    again = FX.train_als(inter)
    a = {r.id: r.features for r in model.userFactors.collect()}
    b = {r.id: r.features for r in again.userFactors.collect()}
    assert a == b


def test_als_beats_global_mean_baseline(spark, inter, model):
    from pyspark.sql import functions as F

    pred = model.transform(inter)
    rmse = pred.select(
        F.sqrt(F.avg((F.col("rating") - F.col("prediction")) ** 2))
    ).first()[0]
    gm = inter.agg(F.avg("rating")).first()[0]
    base = inter.select(
        F.sqrt(F.avg((F.col("rating") - gm) ** 2))
    ).first()[0]
    assert rmse < 0.8 * base


def test_q_als_recommend_shape(spark):
    rows = FX.q_als_recommend(spark, SF).collect()
    assert rows
    by_u: dict[int, list] = {}
    for r in rows:
        assert r.user % 250 == 0
        by_u.setdefault(r.user, []).append(r)
    for recs in by_u.values():
        recs.sort(key=lambda r: r.rank)
        assert [r.rank for r in recs] == list(range(1, len(recs) + 1))
        scores = [r.score for r in recs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert len({r.item for r in recs}) == len(recs)


def test_item_embeddings_feed_the_ann_surface(spark, model):
    emb = FX.item_embeddings(model)
    row = emb.first()
    assert emb.columns == ["item_id", "embedding"]
    assert len(row.embedding) == 8
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
