"""Collaborative-filtering embedding factorization over the TPC-H
interaction graph (customer x part purchase strengths).

Spark-first by construction: the solver is MLlib's distributed ALS —
block-partitioned alternating least squares (Hu/Koren/Volinsky 2008;
Spark's impl is the Zhou et al. 2008 block design), which co-locates
each side's ratings with its factor blocks and solves per-entity
normal equations inside a partition. Hand-rolling the same loop in
Python would re-implement exactly what the engine already ships, so
the module's job is the DATA SHAPE (interaction aggregation), the
DETERMINISM contract (fixed seed + fixed block counts -> byte-stable
factors, pinned in pytest), and the SERVING surface (bounded-user
top-k recommendations; item factors exportable to the ANN family —
an `array<float>` embedding column like any other).

Scale: interactions aggregate with one shuffle (groupBy user,item);
ALS itself shuffles factor blocks per half-iteration — the documented
cost of the algorithm, linear in ratings per sweep. The serving query
bounds the user side (a probe set), so recommendForUserSubset is a
broadcast-sized cross-scoring, not all-users x all-items.

Rows-only for the driver: iterated least-squares has no ANSI-SQL
twin; quality (beats the global-mean baseline) and determinism are
pinned in tests/test_factorization.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import load


def als_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, rating) strengths: per (customer, part), the total
    quantity ever ordered — one join + one shuffle, map-side combined."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("rating"))
    )


def train_als(
    interactions: DataFrame,
    rank: int = 8,
    max_iter: int = 5,
    reg: float = 0.1,
    seed: int = 42,
):
    """Fit the block-ALS model. Fixed seed + MLlib's deterministic
    block assignment (hash of id into a fixed block count) make the
    factors reproducible run-to-run for the same input."""
    from pyspark.ml.recommendation import ALS

    return ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    ).fit(interactions)


def item_embeddings(model) -> DataFrame:
    """Item factors as an embeddings frame (item_id, embedding
    array<float>) — drop-in input for the similarity/ANN family."""
    return model.itemFactors.select(
        F.col("id").alias("item_id"),
        F.col("features").cast("array<float>").alias("embedding"),
    )


def q_als_recommend(
    spark: SparkSession,
    sf_dir: str,
    user_mod: int = 250,
    k: int = 5,
    max_iter: int = 5,
) -> DataFrame:
    """Driver-facing: train ALS on the full interaction set, then
    top-k part recommendations for a bounded probe set of customers
    (custkey % ``user_mod`` == 0) — (user, rank, item, score), score
    rounded to 4. Rows-only; determinism + quality pinned in pytest."""
    from pyspark.sql import Window

    inter = als_interactions(spark, sf_dir)
    model = train_als(inter, max_iter=max_iter)
    # Serving is hand-planned instead of recommendForUserSubset: MLlib
    # plans that as a raw CartesianProduct (both sides unbounded in
    # general), while the probe-set contract here makes the user side
    # parameter-sized — so broadcast it and cross-score the item
    # factors (BroadcastNestedLoopJoin with a bounded build, the
    # q_knn_multi shape), then window top-k. Scores are the factor
    # dot product, the same quantity ALS ranks by.
    uf = model.userFactors.where(F.col("id") % user_mod == 0).select(
        F.col("id").alias("user"), F.col("features").alias("ufeat")
    )
    itf = model.itemFactors.select(
        F.col("id").alias("item"), F.col("features").alias("ifeat")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("ufeat"),
            F.col("ifeat"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0).cast("double"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("user").orderBy(F.desc("score"), F.asc("item"))
    return (
        itf.join(F.broadcast(uf))
        .select("user", "item", F.round(dot, 4).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user", F.col("rank").cast("int").alias("rank"), "item", "score")
        .orderBy("user", "rank")
    )
