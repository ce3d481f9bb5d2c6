"""Time-series mining: PAA/SAX symbolization, motif/discord counts,
and SAX-blocked banded-DTW nearest neighbors.

The reference engine moves datapoints but never mines them; a series
engine at 100 TB needs the classic representation stack (Lin et al.'s
SAX family, Keogh's LB_Keogh lower bound, Sakoe-Chiba banded DTW — all
published, public techniques):

- **PAA** (piecewise aggregate approximation): fixed-width segment
  means over each key's series — one groupBy, map-side combinable.
- **SAX**: symbolize each segment by its within-series quartile
  (``ntile``), giving every series a short word. Quartile breakpoints
  (instead of the usual Gaussian table on z-scores) keep the whole
  operator in integer/rank logic, so the DuckDB oracle twin is
  hash-exact — no floating-point boundary can flip a letter.
- **Motifs/discords**: sliding positional 3-grams over the words,
  counted corpus-wide. A gram seen once is a discord candidate; the
  most frequent grams are the corpus motifs (HOT SAX's candidate
  generation, expressed as two window functions and a groupBy).
- **DTW k-NN**: candidate pairs come from deterministic
  hyperplane-LSH tables over each series' z-normalized PAA profile
  (the repo's ANN-LSH scheme applied to the shape sketch), pruned
  per-probe to the best-m by the cheap LB_Keogh lower bound; only
  the survivors pay the exact banded-DTW dynamic program
  (Arrow-batched pandas UDF). The pair space is blocked ->
  lower-bounded -> verified; never all-pairs.

Scale shape: everything outside the two Arrow stages (LSH sketch,
LB/DTW kernels) is JVM-side (groupBy / window / broadcast equi-joins;
the only cross join is a 1-row global bounds aggregate). LSH key
space is ``tables * 2^bits`` — parameter-bounded — so the hot-block
census is a broadcast filter, and per-probe fan-out is capped by the
LB rank — at 1000 executors the DTW stage is embarrassingly parallel
over capped candidate lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import load

SEG_DAYS = 3
ALPHABET = "abcd"


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, day) with day = floor(epoch seconds / 86400)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
    )


def _bounds(ev: DataFrame) -> DataFrame:
    """1-row global (min_day, max_day) — parameter-sized broadcast."""
    return ev.agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    )


def sax_letters(
    spark: SparkSession, sf_dir: str, seg_days: int = SEG_DAYS
) -> DataFrame:
    """Per (user, segment): event count and quartile SAX letter.

    Dense over the global segment grid (a user with a silent segment
    gets n=0 — silence is signal for symbolization), via a distinct
    user list exploded against the 1-row bounds broadcast; letters are
    ``ntile(4)`` over (n, seg) per user — pure rank logic, engine
    and oracle agree bit-for-bit.
    """
    ev = _daily(spark, sf_dir)
    b = _bounds(ev)
    seg_of = (F.col("day") - F.col("min_day")) / F.lit(seg_days)
    counts = (
        ev.join(F.broadcast(b))
        .select(
            "user_id", F.floor(seg_of).cast("long").alias("seg")
        )
        .groupBy("user_id", "seg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .join(F.broadcast(b))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor(
                        (F.col("max_day") - F.col("min_day"))
                        / F.lit(seg_days)
                    ).cast("long"),
                )
            ).alias("seg"),
        )
    )
    dense = grid.join(counts, ["user_id", "seg"], "left").select(
        "user_id", "seg", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy("n", "seg")
    return dense.withColumn("nt", F.ntile(4).over(w)).select(
        "user_id",
        "seg",
        "n",
        F.expr(f"substr('{ALPHABET}', nt, 1)").alias("letter"),
    )


def q_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX word per user: 10 three-day activity segments -> quartile
    letters -> one 10-char word. The symbolic fingerprint that powers
    motif counting and DTW blocking, surfaced as its own query."""
    lett = sax_letters(spark, sf_dir)
    return (
        lett.groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seg", "letter"))
                    ),
                    lambda s: s["letter"],
                ),
            ).alias("word"),
        )
        .orderBy("user_id")
    )


def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide sliding 3-gram counts over the SAX words: the most
    frequent grams are activity motifs; a gram seen exactly once is a
    discord candidate (HOT SAX candidate generation). Window leads +
    one groupBy on a domain-bounded key (<= alphabet^3 grams)."""
    lett = sax_letters(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("seg")
    grams = (
        lett.select(
            "user_id",
            "letter",
            F.lead("letter", 1).over(w).alias("l1"),
            F.lead("letter", 2).over(w).alias("l2"),
        )
        .where(F.col("l2").isNotNull())
        .select(
            "user_id",
            F.concat("letter", "l1", "l2").alias("motif"),
        )
    )
    return (
        grams.groupBy("motif")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn("is_discord", F.col("n_windows") == 1)
        .orderBy(F.desc("n_windows"), "motif")
    )


def user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily-count series over the global day range,
    assembled without a join explosion: per-user sparse day->count
    map, then one ``transform(sequence(...))`` fill — map-side after
    the single (user, day) aggregate."""
    ev = _daily(spark, sf_dir)
    b = _bounds(ev)
    counts = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.join(F.broadcast(b))
        .groupBy("user_id", "min_day", "max_day")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("day") - F.col("min_day"))
                        .cast("int")
                        .alias("k"),
                        F.col("n").cast("double").alias("v"),
                    )
                )
            ).alias("m")
        )
        .select(
            "user_id",
            F.transform(
                F.sequence(
                    F.lit(0),
                    (F.col("max_day") - F.col("min_day")).cast("int"),
                ),
                lambda i: F.coalesce(
                    F.try_element_at("m", i), F.lit(0.0)
                ),
            ).alias("series"),
        )
    )


def _znorm(x: np.ndarray) -> np.ndarray:
    """Per-series z-normalization — DTW's standard preprocessing
    (shape similarity, not magnitude), which also aligns the metric
    with the rank-based SAX blocking. Constant series map to zeros."""
    sd = float(np.std(x))
    if sd < 1e-9:
        return np.zeros_like(x, dtype=np.float64)
    return (x - float(np.mean(x))) / sd


def _dtw_band(x: np.ndarray, y: np.ndarray, r: int) -> float:
    """Exact Sakoe-Chiba banded DTW distance (squared-error cost,
    sqrt at the end). O(n * band) cells."""
    n = len(x)
    prev = np.full(n + 1, np.inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(n + 1, np.inf)
        for j in range(max(1, i - r), min(n, i + r) + 1):
            c = (x[i - 1] - y[j - 1]) ** 2
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(np.sqrt(prev[n]))


def _lb_keogh(x: np.ndarray, y: np.ndarray, r: int) -> float:
    """Keogh lower bound: distance from x to the banded envelope of
    y. Always <= DTW(x, y) for the same band; vectorized."""
    n = len(y)
    upper = np.array(
        [y[max(0, i - r): min(n, i + r + 1)].max() for i in range(n)]
    )
    lower = np.array(
        [y[max(0, i - r): min(n, i + r + 1)].min() for i in range(n)]
    )
    above = np.where(x > upper, x - upper, 0.0)
    below = np.where(x < lower, lower - x, 0.0)
    return float(np.sqrt(np.sum(above**2 + below**2)))


def dtw_nearest_neighbor(
    series: DataFrame,
    band: int = 3,
    lb_top_m: int = 8,
    hot_block_cap: int = 300,
    tables: int = 12,
    bits: int | None = None,
    seg_days: int = SEG_DAYS,
    seed: int = 1234,
) -> DataFrame:
    """Approximate nearest neighbor by banded DTW, never the pair
    space.

    1. **Index**: each series is sketched to its z-normalized PAA
       profile and hashed by ``tables`` deterministic hyperplane-LSH
       tables of ``bits`` bits (the repo's ANN-LSH scheme applied to
       the shape sketch — small banded-DTW distance implies small
       euclidean distance on z-profiles, which hyperplane LSH
       preserves). One Arrow pass over (user, series).
    2. **Blocks**: candidate pairs come from a self equi-join on
       (table, key); the key space is ``tables * 2^bits`` — parameter
       bounded — so the population census is a broadcast, and blocks
       above ``hot_block_cap`` are dropped (an unselective bucket
       carries no discrimination; size ``bits`` for the corpus so
       blocks stay ~n/2^bits).
    3. **LB_Keogh pass** (cheap, vectorized lower bound): each probe
       keeps only its ``lb_top_m`` best-lower-bound partners.
    4. **Exact banded DTW** only on the survivors; min_by per user
       with a (distance, neighbor-id) tie-break so output is
       deterministic. Quality contract (pinned in tests): the found
       neighbor's distance is within ~1.25x of the true nearest for
       the overwhelming majority of probes, at O(n * block + n *
       lb_top_m * DTW) cost instead of O(n^2) DTW.
    """
    n_tables, sdays, rseed = tables, seg_days, seed
    # Three consumers read the series frame (the sizing count, the
    # LSH-key pass, the envelope-prep pass); localCheckpoint runs its
    # upstream DAG (typically an events groupBy) once instead of
    # three times — the multi-consumer materialization discipline
    # minhash_dedup uses for its signatures.
    if bits is None:
        # Auto-size so expected block population ~ 32. The sizing
        # count rides the series checkpoint's own job as an observed
        # metric — one action instead of two (guide §5).
        obs = Observation()
        series = series.observe(
            obs, F.count(F.lit(1)).alias("n")
        ).localCheckpoint()
        n = obs.get["n"]
        n_bits = max(3, min(12, int(np.ceil(np.log2(max(n, 1) / 32 + 1)))))
    else:
        series = series.localCheckpoint()
        n_bits = bits

    def _keys(batches):
        planes = None
        for pdf in batches:
            out_u, out_t, out_k = [], [], []
            for uid, s in zip(pdf["user_id"], pdf["series"]):
                x = np.asarray(s, dtype=np.float64)
                n_seg = len(x) // sdays
                if n_seg < 1:
                    continue
                prof = _znorm(
                    x[: n_seg * sdays].reshape(n_seg, sdays).mean(axis=1)
                )
                if planes is None or planes.shape[2] != len(prof):
                    # deterministic: same seed on every partition
                    planes = np.random.default_rng(rseed).normal(
                        size=(n_tables, n_bits, len(prof))
                    )
                for t in range(n_tables):
                    sig = (planes[t] @ prof) > 0
                    out_u.append(uid)
                    out_t.append(t)
                    out_k.append(int(sig.dot(1 << np.arange(n_bits))))
            yield pd.DataFrame(
                {"user_id": out_u, "tbl": out_t, "key": out_k}
            )

    # keys feeds the census AND the cold-block join; prep feeds both
    # pair sides — checkpoint each so the Arrow passes run once.
    keys_lazy = series.mapInPandas(_keys, "user_id long, tbl int, key int")

    # One Arrow pass per user (NOT per pair): z-normalize and build
    # the banded Keogh envelope once; every downstream LB evaluation
    # is then a fully vectorized O(len) numpy row op.
    def _prep(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            zs, eus, els = [], [], []
            for s in pdf["series"]:
                z = _znorm(np.asarray(s, dtype=np.float64))
                n = len(z)
                eu = np.array(
                    [
                        z[max(0, i - band): min(n, i + band + 1)].max()
                        for i in range(n)
                    ]
                )
                el = np.array(
                    [
                        z[max(0, i - band): min(n, i + band + 1)].min()
                        for i in range(n)
                    ]
                )
                zs.append(list(z))
                eus.append(list(eu))
                els.append(list(el))
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"].to_numpy(),
                    "z": zs,
                    "eu": eus,
                    "el": els,
                }
            )

    prep_schema = (
        "user_id long, z array<double>, eu array<double>, el array<double>"
    )
    prep_lazy = series.mapInPandas(_prep, prep_schema)

    # keys and prep are INDEPENDENT Arrow passes over the same
    # checkpointed series frame; materialize them as two concurrent
    # jobs from a small driver pool (guide §2.6) so the second pass
    # back-fills executor cores freed by the first one's tail instead
    # of running strictly after it.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _fk = _pool.submit(keys_lazy.localCheckpoint)
        _fp = _pool.submit(prep_lazy.localCheckpoint)
        keys = _fk.result()
        prep = _fp.result()

    census = keys.groupBy("tbl", "key").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    cold = keys.join(
        F.broadcast(census.where(F.col("block_n") <= hot_block_cap)),
        ["tbl", "key"],
    ).select("user_id", "tbl", "key")

    a = cold.select(F.col("user_id").alias("ua"), "tbl", "key")
    bb = cold.select(F.col("user_id").alias("ub"), "tbl", "key")
    cand = (
        a.join(bb, ["tbl", "key"])
        .where(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )

    sa = prep.select(
        F.col("user_id").alias("ua"),
        F.col("z").alias("za"),
        F.col("eu").alias("eua"),
        F.col("el").alias("ela"),
    )
    sb = prep.select(
        F.col("user_id").alias("ub"),
        F.col("z").alias("zb"),
        F.col("eu").alias("eub"),
        F.col("el").alias("elb"),
    )
    pairs = cand.join(sa, "ua").join(sb, "ub")

    @F.pandas_udf("double")
    def lb_udf(
        za: pd.Series,
        eua: pd.Series,
        ela: pd.Series,
        zb: pd.Series,
        eub: pd.Series,
        elb: pd.Series,
    ) -> pd.Series:
        if not len(za):
            return pd.Series([], dtype=np.float64)
        A = np.stack([np.asarray(v) for v in za])
        UA = np.stack([np.asarray(v) for v in eua])
        LA = np.stack([np.asarray(v) for v in ela])
        B = np.stack([np.asarray(v) for v in zb])
        UB = np.stack([np.asarray(v) for v in eub])
        LB = np.stack([np.asarray(v) for v in elb])
        d_ab = np.sqrt(
            (np.maximum(A - UB, 0.0) ** 2).sum(axis=1)
            + (np.maximum(LB - A, 0.0) ** 2).sum(axis=1)
        )
        d_ba = np.sqrt(
            (np.maximum(B - UA, 0.0) ** 2).sum(axis=1)
            + (np.maximum(LA - B, 0.0) ** 2).sum(axis=1)
        )
        # max of the two directed bounds: still a valid DTW lower
        # bound (each is), and tighter than either alone.
        return pd.Series(np.maximum(d_ab, d_ba))

    @F.pandas_udf("double")
    def dtw_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _dtw_band(
                    np.asarray(x, dtype=np.float64),
                    np.asarray(y, dtype=np.float64),
                    band,
                )
                for x, y in zip(xs, ys)
            ]
        )

    with_lb = pairs.withColumn(
        "lb", lb_udf("za", "eua", "ela", "zb", "eub", "elb")
    ).select("ua", "ub", "za", "zb", "lb")
    # Each pair serves both endpoints as probes; prune per endpoint.
    both = with_lb.select(
        F.col("ua").alias("probe"),
        F.col("ub").alias("other"),
        F.col("za").alias("xa"),
        F.col("zb").alias("xb"),
        "lb",
    ).unionByName(
        with_lb.select(
            F.col("ub").alias("probe"),
            F.col("ua").alias("other"),
            F.col("zb").alias("xa"),
            F.col("za").alias("xb"),
            "lb",
        )
    )
    wp = Window.partitionBy("probe").orderBy("lb", "other")
    pruned = both.withColumn("rk", F.row_number().over(wp)).where(
        F.col("rk") <= lb_top_m
    )
    scored = pruned.withColumn("dtw", dtw_udf("xa", "xb"))
    return (
        scored.groupBy("probe")
        .agg(
            F.min_by(
                F.struct(
                    F.col("dtw"), F.col("other")
                ),
                F.struct(F.col("dtw"), F.col("other")),
            ).alias("best")
        )
        .select(
            F.col("probe").alias("user_id"),
            F.col("best.other").alias("nn_user_id"),
            F.round("best.dtw", 4).alias("dtw_dist"),
        )
        .orderBy("user_id")
    )


def q_dtw_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user nearest neighbor in daily-activity shape under banded
    DTW — PAA-profile LSH blocked, LB_Keogh pruned, exact on
    survivors.
    Rows-only (a dynamic program is not ANSI-SQL-expressible); the
    kernel and funnel are pinned against a brute-force NumPy
    reference in tests/test_seriesmining.py."""
    return dtw_nearest_neighbor(user_series(spark, sf_dir))
