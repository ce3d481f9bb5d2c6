"""Skew-handling join: salting for pathological hot keys (Phase 5).

AQE's skew-join splitting (on in session.py) handles most skew for
sort-merge joins at runtime. Salting is the explicit fallback for the
cases AQE can't fix — e.g. a shuffled join where ONE key holds half
the table (a "null island" or a mega-series in the datapoints model):

    fact side:  salt = pmod(xxhash64(<row id cols>), n_salts)
    dim side:   replicated n_salts times (explode)
    join key:   (key, salt)  -> hot key spreads over n_salts tasks

Cost: dim side grows n_salts x (fine — it's the small side by
definition); fact side gets one extra tiny column. Result equality
with the plain join is pinned by tests on deliberately skewed data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with small ``dim`` on column ``on``, salted.

    ``salt_from`` names fact columns whose hash spreads the hot key
    (default: all non-key columns — any stable per-row attribute
    works; monotonically_increasing_id would too but is
    partition-layout-dependent).
    """
    cols = salt_from or [c for c in fact.columns if c != on]
    if not cols:
        raise ValueError("salted_join needs at least one non-key column to salt from")
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    salted_fact = fact.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def pin_grouped_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Floor the task count of a downstream grouped Arrow stage.

    AQE's size-based partition coalescing prices shuffle bytes only, so
    a frame that is small in bytes but expensive per row on the Python
    side (applyInPandas / cogroup) collapses to ONE partition and a
    single Python worker walks every group sequentially — measured
    5.2 s -> 0.9 s on lttb_downsample at sf0.1/local[32]. An explicit
    ``repartition(n, keys)`` is exempt from AQE coalescing, and the
    following groupBy reuses its hash partitioning (no second
    exchange), so this costs nothing at real scale — where shuffle
    sizes exceed the advisory target anyway — and restores executor
    parallelism in the small-bytes regime.
    """
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return df.repartition(n, *[F.col(k) for k in keys])


def spread_scan(df: DataFrame, already_parallel: bool | None = None) -> DataFrame:
    """Conditionally fan a NARROW scan out to cluster parallelism
    before per-row-heavy map work (tokenize -> explode -> hash chains).

    A corpus that is one parquet split runs its whole scan stage on
    one core — the map-side twin of the grouped-stage trap
    pin_grouped_parallelism handles (there the fix pins an existing
    shuffle's partition count; here there is NO shuffle to pin, so
    one must be introduced). The repartition only fires when the scan
    yields fewer splits than the executor count: at real scale file
    splits >> cores and this is a plan no-op — no shuffle, no cost —
    so the full-corpus reshuffle it would imply at 100 TB never
    happens.

    The parallelism probe is METADATA-ONLY: ``df.inputFiles()`` (the
    scan's file listing — a lower bound on its split count) plus a
    logical-plan check for an upstream ``Repartition``. The earlier
    RDD-based probe (getNumPartitions) forced an eager plan-to-RDD
    conversion on the driver per call, which defeats lazy composition
    inside ``foreachBatch``-style loops. Callers that already know
    their frame's layout can skip the probe entirely with
    ``already_parallel``.
    """
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    if already_parallel is None:
        if len(df.inputFiles()) >= n:
            # >= n source files: treat the scan as parallel. (Tiny
            # files can still be packed into fewer FilePartitions; a
            # miss in that corner costs fan-out for one stage, never
            # correctness — and a corpus of >= n files that small is
            # below the regime where the fan-out matters.)
            already_parallel = True
        else:
            # An in-plan Repartition/RepartitionByExpression already
            # fans the frame out; reading the ANALYZED logical plan is
            # driver-side metadata (no physical planning, no RDD).
            logical = df._jdf.queryExecution().analyzed().toString()
            already_parallel = "Repartition" in logical
    if already_parallel:
        return df
    return df.repartition(n)


def partitioned_checkpoint(df: DataFrame, *keys: str) -> DataFrame:
    """Materialize ``df`` hash-partitioned on ``keys`` with the
    partitioning METADATA preserved, so every later join/aggregate on
    those keys skips its Exchange on this side.

    The iterative operators (pagerank / k-core / BFS / SSSP / LPA)
    join a static edge-bounded frame against a node-bounded frame
    once per round; left to itself each round re-shuffles the EDGE
    frame — the large side — every iteration. Partitioning the edge
    frame on the per-round join key once turns every round into a
    shuffle of the node-bounded side only (guide §2: remove shuffles
    where the data is already partitioned as needed).

    Plain ``localCheckpoint()`` cannot do this under AQE: the
    AdaptiveSparkPlanExec reports UnknownPartitioning, so the
    checkpointed LogicalRDD loses the layout and downstream
    EnsureRequirements re-shuffles (measured: hashpartitioning ->
    UnknownPartitioning(0) on Spark 4.1). Disabling AQE just for the
    one repartition+checkpoint materialization keeps the physical
    plan's HashPartitioning visible to the LogicalRDD; the frame is
    tiny-stage work (one round-robin-to-hash exchange), so losing
    AQE for it costs nothing. Partition count follows
    ``spark.sql.shuffle.partitions`` — conf-driven, so the cluster
    deployment scales it without code changes."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        out = df.repartition(n, *keys).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    return out
