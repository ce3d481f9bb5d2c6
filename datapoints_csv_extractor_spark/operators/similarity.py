"""Similarity search over the embeddings table (ARRAY<FLOAT>).

Baseline: brute-force cosine top-k — exact, O(n) per query, the
correctness anchor. Scale path: random-hyperplane LSH bucketing that
prunes the candidate set before exact re-scoring (recall checked in
pytest against the brute-force truth).

All vector math is double-precision JVM higher-order functions
(zip_with + aggregate) — deterministic sequential accumulation, which
the DuckDB oracle mirrors with unnest-based double sums (DuckDB's own
list_cosine_similarity runs float32 and would diverge).

Scale notes: brute-force per-query is a broadcast of the query vector
and a full scan — fine for one query over any n, wrong for n x n.
Pairwise similarity uses label blocking here (stand-in for an IVF
coarse quantizer / LSH bucket at 100 TB): pairs only form inside a
block, collapsing O(n^2) to O(sum b_i^2).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import Column, DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import load


def _f64_lit(values) -> Column:
    """One float64 array literal via the numpy lit path: a single py4j
    call producing a true JVM Literal. F.lit(list) / F.array(*lits)
    instead issues one py4j round-trip per element at build time AND
    leaves a CreateArray expression that is re-evaluated per row (per
    ELEMENT when referenced inside a HOF lambda body, where constant
    folding does not descend). Float64 conversion is value-exact."""
    import numpy as np

    return F.lit(np.asarray(list(values), dtype=np.float64))

_HYPERPLANE_BITS = 16


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism before a
    per-row-expensive map stage (the interpreted `_nearest_cell` HOF).

    A small-by-bytes parquet scan arrives as ONE split, so the
    assignment fold runs single-threaded even on local[32]; an
    explicit repartition is exempt from AQE coalescing and costs one
    tiny shuffle. Row-local expressions are unaffected by placement,
    so output values are identical — only task fan-out changes. At
    real scale the scan already yields >= parallelism splits and this
    is a near-no-op (Spark still inserts the exchange, amortized by
    the downstream per-row work it balances).
    """
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return df.repartition(n)


def _require_row(row: Row | None, what: str) -> Row:
    """Guard for driver-side parameter fetches: a missing query id or
    an empty input frame raises a clear ValueError instead of the
    TypeError that indexing None would produce."""
    if row is None:
        raise ValueError(f"no row found for {what}")
    return row


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector basics: dimension, L2 norm, component mean per vector."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        "label",
        F.size(emb).alias("dim"),
        F.round(_norm(emb), 4).alias("l2_norm"),
        # + 0.0: a tiny negative component mean rounds to IEEE -0.0 in
        # one engine and 0.0 in the other (hash-divergent).
        (
            F.round(
                _dot(emb, F.transform(emb, lambda _: F.lit(1.0))) / F.size(emb), 4
            )
            + F.lit(0.0)
        ).alias("mean_component"),
    )


def q_knn_brute_force(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors of one query vector.

    The query vector is fetched once driver-side (a parameter, like a
    literal in SQL) and inlined as an array literal -> broadcast to
    every task; the scan stays a single no-shuffle pass + TakeOrdered.
    Ordering ties break on vec_id over the ROUNDED score so the top-k
    set is engine-independent.
    """
    e = load(spark, sf_dir, "embeddings")
    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    qlit = _f64_lit(float(x) for x in qrow[0])
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    return (
        e.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _blocked_candidates_arrow(
    e: DataFrame, threshold: float, margin: float = 1e-6
) -> DataFrame:
    """Candidate (vec_id_1 < vec_id_2) pairs per label block whose
    numpy-cosine clears ``threshold - margin`` — one whole-block gram
    matrix per label (applyInPandas), the SemDeDup cell shape. The
    margin covers the <=few-ulp disagreement between numpy's blocked
    matmul summation and the JVM's sequential fold, so no pair the
    exact pass would keep can be lost here."""
    import pandas as pd

    cut = threshold - margin

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame({"vec_id_1": [], "vec_id_2": []}).astype("int64")
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = np.sqrt((m * m).sum(axis=1))
        n[n == 0.0] = 1.0
        sims = (m / n[:, None]) @ (m / n[:, None]).T
        iu = np.triu_indices(len(pdf), k=1)
        keep = sims[iu] >= cut
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame(
            {"vec_id_1": ids[iu[0][keep]], "vec_id_2": ids[iu[1][keep]]}
        )

    return _spread(e.select("vec_id", "label", "embedding")).groupBy(
        "label"
    ).applyInPandas(_pairs, "vec_id_1 long, vec_id_2 long")


def q_embedding_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.45
) -> DataFrame:
    """Pairwise near-duplicate vectors (cosine >= threshold), blocked
    by label: the blocking key caps the quadratic pair space exactly
    the way an IVF/LSH bucket does at scale.

    Two-stage exact plan: Arrow whole-block gram matrices generate the
    candidates (a few hundred numpy matmuls instead of |block|^2
    interpreted HOF cosines — measured 11 s -> ~5 s at sf0.1 inside
    the multimodal composite), then the JVM re-scores ONLY the
    candidates with the same sequential-fold cosine expression as
    before, so the rounded output — and the DuckDB oracle — are
    bit-identical to the plain pair join."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    cand = _blocked_candidates_arrow(e, threshold)
    a = e.select(
        F.col("vec_id").alias("vec_id_1"),
        F.col("label"),
        F.col("embedding").alias("emb_1"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_id_2"), F.col("embedding").alias("emb_2")
    )
    cos = F.round(cosine(F.col("emb_1"), F.col("emb_2")), 4)
    return (
        cand.join(a, "vec_id_1")
        .join(b, "vec_id_2")
        .select(
            "vec_id_1",
            "vec_id_2",
            "label",
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_bits: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1), expanded
    driver-side from a fixed LCG seed (same determinism contract as
    dedup's MinHash permutation table): reproducible across runs and
    engines with no stored model, and — unlike deriving components
    per row from xxhash64 — computed exactly once instead of
    n_bits x dim hash calls per input row."""
    state = 0x5DEECE66D ^ 0x9E3779B9
    planes: list[list[float]] = []
    for _ in range(n_bits):
        row = []
        for _ in range(dim):
            # Full 2^64 modulus (the multiplier's design modulus) and
            # HIGH bits only: low-order LCG bits have short periods, so
            # deriving components from `state % 2001` correlates
            # consecutive draws and weakens hyperplane independence.
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((((state >> 33) % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def embedding_near_dup_lsh_df(
    e: DataFrame,
    threshold: float = 0.45,
    n_bits: int = 6,
    n_bands: int = 4,
    max_bucket: int = 4096,
) -> DataFrame:
    """Embedding near-dup pairs with banded hyperplane-LSH blocking —
    the scale path that replaces q_embedding_near_dup's label blocking
    when no natural blocking key exists.

    Standard AND-OR amplification (same shape as the MinHash band
    join): ``n_bands`` independent families of ``n_bits`` hyperplanes
    each; a pair becomes a candidate when it agrees on EVERY sign in
    ANY band. High-cosine pairs agree on most signs, so per-band
    collision probability is high and the OR over bands drives recall
    toward 1, while random pairs need all n_bits agreements at once.
    Candidates are then exactly re-scored (cosine >= threshold) — the
    verify join fetches embeddings by vec_id, a shuffle proportional to
    candidates, not n^2. Band buckets over ``max_bucket`` are dropped
    (hot-key guard; a hub bucket re-surfaces through other bands).

    Input needs (vec_id, embedding); approximate, so rows-only at the
    driver + a planted-duplicate pytest.
    """
    first = e.select("embedding").first()
    if first is None:
        # Empty input: no pairs, and no dimension to derive planes
        # from — return the (empty) output shape directly.
        return e.sparkSession.createDataFrame(
            [], "vec_id_1 long, vec_id_2 long, cosine double"
        )
    dim = len(first[0])
    vecs = e.select("vec_id", "embedding")
    planes = _hyperplanes(dim, n_bands * n_bits)
    # Banding is ONE Arrow-batched matrix product per partition:
    # (batch x dim) @ (dim x n_bands*n_bits) then sign -> bucket bits.
    # The HOF formulation (24 interpreted aggregate/zip_with folds per
    # vector — higher-order functions skip codegen) measured ~2 s of
    # this query's sf0.1 runtime; the matmul is microseconds per batch
    # and the Arrow transfer ships each vector once. numpy's pairwise
    # summation can differ from a sequential fold in the last ulp for
    # dots ~0, which is fine HERE because both sides of the band join
    # come from this same pass (self-consistent blocking) and the
    # operator is approximate/rows-only by contract; the persisted-LSH
    # lifecycle (build_lsh_index / ann_lsh_topk_from_index) keeps the
    # sequential-fold lsh_bucket so driver-side query bucketing stays
    # bit-identical to the stored corpus buckets.
    bits_schema = "vec_id long, band_id int, bucket long"

    def _band(batches):
        import numpy as np
        import pandas as pd

        P = np.array(planes, dtype=np.float64).T  # dim x (n_bands*n_bits)
        bitvals = np.array([1 << j for j in range(n_bits)], dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            signs = (M @ P) > 0
            frames = []
            for band in range(n_bands):
                chunk = signs[:, band * n_bits : (band + 1) * n_bits]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "band_id": band,
                            "bucket": (chunk * bitvals).sum(axis=1),
                        }
                    )
                )
            yield pd.concat(frames)

    # Three consumers read the banded frame (hot-bucket aggregate +
    # both sides of the self-join); localCheckpoint runs the banding
    # pass ONCE instead of three times. 4 small rows per vector —
    # cheap to materialize.
    bands = vecs.mapInPandas(_band, bits_schema).localCheckpoint()
    hot = (
        bands.groupBy("band_id", "bucket")
        .agg(F.count("*").alias("sz"))
        .where(F.col("sz") > max_bucket)
        .select("band_id", "bucket")
    )
    bands = bands.join(F.broadcast(hot), ["band_id", "bucket"], "left_anti")
    a2, b2 = bands.alias("a"), bands.alias("b")
    cand = (
        a2.join(
            b2,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_1"), F.col("b.vec_id").alias("vec_id_2")
        )
        .distinct()
    )
    # Re-score with PER-VECTOR norms computed once before the pair
    # join (each vector lands in many candidate pairs), then the
    # per-pair dot product in one Arrow batch per partition: the
    # candidate set is the big intermediate here (hundreds of pairs
    # per vector pre-dedup), and an interpreted HOF fold per pair was
    # the dominant cost after banding went vectorized — the einsum
    # row-dot is the same n*dim work at C speed.
    normed = vecs.withColumn("nrm", _norm(F.col("embedding")))
    e1 = normed.select(
        F.col("vec_id").alias("vec_id_1"),
        F.col("embedding").alias("emb_1"),
        F.col("nrm").alias("nrm_1"),
    )
    e2 = normed.select(
        F.col("vec_id").alias("vec_id_2"),
        F.col("embedding").alias("emb_2"),
        F.col("nrm").alias("nrm_2"),
    )

    def _score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m1 = np.array(pdf["emb_1"].tolist(), dtype=np.float64)
            m2 = np.array(pdf["emb_2"].tolist(), dtype=np.float64)
            dots = np.einsum("ij,ij->i", m1, m2)
            raw = dots / (pdf["nrm_1"].to_numpy() * pdf["nrm_2"].to_numpy())
            # floor(x*1e4+0.5), not np.round: numpy rounds half-to-even
            # while Spark's F.round (used by every sibling scorer, e.g.
            # the brute-force kNN) rounds half-up — boundary cosines
            # like 0.44995 must cut the threshold identically on both
            # paths. Valid for the non-negative scores that survive the
            # threshold filter.
            cos = np.floor(raw * 10000.0 + 0.5) / 10000.0
            yield pd.DataFrame(
                {
                    "vec_id_1": pdf["vec_id_1"].to_numpy(),
                    "vec_id_2": pdf["vec_id_2"].to_numpy(),
                    "cosine": cos,
                }
            )

    return (
        cand.join(e1, "vec_id_1")
        .join(e2, "vec_id_2")
        .select("vec_id_1", "vec_id_2", "emb_1", "emb_2", "nrm_1", "nrm_2")
        .mapInPandas(_score, "vec_id_1 long, vec_id_2 long, cosine double")
        .where(F.col("cosine") >= threshold)
    )


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing LSH-blocked embedding near-dup (rows-only)."""
    return embedding_near_dup_lsh_df(load(spark, sf_dir, "embeddings"))


def lsh_bucket(emb: Column, dim: int, n_bits: int = _HYPERPLANE_BITS) -> Column:
    """Random-hyperplane LSH bucket id: bit j = sign of dot(emb, H_j).
    Hyperplanes are broadcast as array literals (the IVF
    centroid-literal pattern); per row the work is n_bits dot
    products, all JVM-side."""
    out = F.lit(0)
    for j, row in enumerate(_hyperplanes(dim, n_bits)):
        comp = _f64_lit(row)
        d = F.aggregate(
            F.zip_with(emb, comp, lambda x, y: x.cast("double") * y),
            F.lit(0).cast("double"),
            lambda acc, x: acc + x,
        )
        out = out + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("long")


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k over the embeddings table (see ann_lsh_topk_df)."""
    return ann_lsh_topk_df(
        load(spark, sf_dir, "embeddings"), query_vec_id, k=k, n_bits=n_bits
    )


def ann_lsh_topk_df(
    e: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket
    (or differing in one bit — multi-probe) are exactly re-scored.
    Input needs (vec_id, label, embedding). Recall on data with real
    near-neighbors is asserted in pytest (planted-duplicate test;
    isotropic random data has no structure for LSH to exploit)."""
    dim = len(_require_row(e.select("embedding").first(), "any embedding row")[0])
    bucketed = e.withColumn("bucket", lsh_bucket(F.col("embedding"), dim, n_bits))
    qrow = _require_row(
        bucketed.where(F.col("vec_id") == query_vec_id)
        .select("embedding", "bucket")
        .first(),
        f"query vec_id={query_vec_id}",
    )
    qlit = _f64_lit(float(x) for x in qrow[0])
    qbucket = qrow[1]
    probes = [qbucket] + [qbucket ^ (1 << j) for j in range(n_bits)]
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    return (
        bucketed.where(F.col("bucket").isin(probes))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _cos_list(a: list[float], b: list[float]) -> float:
    """Driver-side cosine for parameter-sized data (probe-cell
    selection). Single definition: the training path and the
    persisted-index path must pick probe cells IDENTICALLY for the
    documented result-parity guarantee."""
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb)


def _nearest_cell(emb: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the max-cosine centroid, via a per-row HOF over
    a broadcast centroid array literal — NO join, NO shuffle."""
    cent_lit = F.array(*[_f64_lit(c) for c in centroids])
    sims = F.transform(cent_lit, lambda c: cosine(emb, c))
    # array_position is 1-based; cell ids 0-based.
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def train_ivf_centroids(
    e: DataFrame, n_centroids: int = 16, n_iters: int = 2
) -> list[list[float]]:
    """Deterministic distributed k-means for the IVF coarse quantizer.

    Init = the first ``n_centroids`` vectors by vec_id (deterministic,
    no RNG); each Lloyd iteration is one distributed pass — map-only
    nearest-centroid assignment + per-cell partial sums (Arrow-batched,
    centroids broadcast inside the closure) + a groupBy(cell) combine
    whose shuffle carries only ~n_centroids x dim partials per batch.
    Driver handles parameter-sized data only (the centroid table).
    This is the textbook scale shape: cost is n_iters scans,
    independent of n^2.

    Empty cells keep their previous centroid (standard fix).
    """
    first = (
        e.where(F.col("vec_id") < n_centroids).select("vec_id", "embedding").collect()
    )
    centroids = [
        [float(x) for x in r.embedding]
        for r in sorted(first, key=lambda r: r.vec_id)
    ]
    dim = len(centroids[0])
    # Each Lloyd pass runs assignment + per-cell partial sums inside
    # ONE Arrow batch pass (nearest centroid = an (n x k) normalized
    # matmul argmax; partial sums = k row-sums), emitting k-ish tiny
    # rows per batch; the JVM then combines partials with one k-row
    # groupBy. The earlier all-JVM formulation (16 interpreted HOF
    # cosines per vector per pass + a 64-column sum aggregate)
    # measured ~8 s at sf0.1 — interpreted HOFs skip codegen — vs
    # sub-second vectorized. The per-vector FINAL assignment consumers
    # (ingest-time `_nearest_cell` column) stay JVM/map-only.
    # _spread: the Lloyd pass is per-row-expensive Python work over a
    # scan that may arrive as one split; repartition is deterministic
    # (sortBeforeRepartition), so run-to-run centroid equality holds.
    # Iterative training re-reads its input once per Lloyd pass —
    # persist it (memory, spill-to-disk) like any iterative ML loop,
    # and release it before returning.
    vecs = _spread(e.select("embedding")).persist()
    schema = "cell int, n long, " + ", ".join(f"s{i} double" for i in range(dim))
    cols = ["cell", "n"] + [f"s{i}" for i in range(dim)]
    for _ in range(n_iters):
        cent_now = [list(c) for c in centroids]

        def _partials(batches, cent=cent_now):
            import numpy as np
            import pandas as pd

            c_arr = np.array(cent, dtype=np.float64)
            c_norm = np.sqrt((c_arr * c_arr).sum(axis=1))
            c_norm[c_norm == 0.0] = 1.0
            c_hat = c_arr / c_norm[:, None]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                m_norm = np.sqrt((m * m).sum(axis=1))
                m_norm[m_norm == 0.0] = 1.0
                cells = ((m / m_norm[:, None]) @ c_hat.T).argmax(axis=1)
                rows = []
                for c in np.unique(cells):
                    sel = m[cells == c]
                    rows.append([int(c), len(sel), *sel.sum(axis=0)])
                yield pd.DataFrame(rows, columns=cols)

        sums = (
            vecs.mapInPandas(_partials, schema)
            .groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cell = {r["cell"]: r for r in sums}
        centroids = [
            [by_cell[c][f"s{i}"] / by_cell[c]["n"] for i in range(dim)]
            if c in by_cell
            else centroids[c]
            for c in range(len(centroids))
        ]
    vecs.unpersist()
    return centroids


def ann_ivf_topk_df(
    e: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_train_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k over (vec_id, label,
    embedding).

    Coarse quantizer: deterministic distributed k-means
    (``train_ivf_centroids``: first-n init + ``n_train_iters`` Lloyd
    passes, each one scan). Every vector is assigned to its nearest
    centroid with a per-row higher-order ``transform`` over a broadcast
    centroid array literal — NO join, NO shuffle for assignment. The
    query probes its ``n_probe`` nearest cells and re-scores exactly
    inside them.

    At 100 TB the training runs once at ingest, the assignment pass is
    a map-only column add computed at ingest and stored; queries then
    prune to n_probe/n_centroids of the data — the same
    partition-pruning story as the date-partitioned datapoints sink,
    applied to vector space.
    """
    centroids = train_ivf_centroids(e, n_centroids, n_train_iters)
    assigned = _spread(e).withColumn(
        "cell", _nearest_cell(F.col("embedding"), centroids)
    )

    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    qvec = [float(x) for x in qrow[0]]
    probe_cells = [
        cid
        for cid, _ in sorted(
            ((i, _cos_list(qvec, c)) for i, c in enumerate(centroids)),
            key=lambda t: -t[1],
        )[:n_probe]
    ]
    qlit = _f64_lit(qvec)
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    return (
        assigned.where(F.col("cell").isin(probe_cells))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def read_ivf_centroids(spark: SparkSession, index_dir: str) -> list[list[float]]:
    """The stored coarse quantizer, cell-ordered (parameter-sized:
    n_centroids rows — every query collects it)."""
    cent_rows = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    if not cent_rows:
        raise ValueError(f"empty IVF centroid table under {index_dir}")
    return [
        [float(x) for x in r["centroid"]]
        for r in sorted(cent_rows, key=lambda r: r["cell"])
    ]


def read_ivf_assignments(spark: SparkSession, index_dir: str) -> DataFrame:
    """Committed rows of the IVF assignment store (with their ``cell``
    partition column, ``ingest`` dropped).

    The store is manifest-committed like the text-side band store
    (``assignments/ingest=<id>/cell=<n>/``, ``manifest.json`` at the
    index root): readers see ONLY manifest-listed ingest directories,
    so crash leftovers from an uncommitted fold are invisible and a
    compaction's directory GC can never race a reader that holds the
    old manifest. ``cell`` stays a partition column, so an
    ``isin(cells)`` filter still prunes at file-listing time.
    Pre-manifest stores (flat ``assignments/cell=<n>/``) read as-is
    for backward compatibility.

    Tombstoned vec_ids (``delete_from_store`` on the index dir — the
    redaction path) are anti-joined out here, so EVERY consumer
    (top-k serving, cell balance, refresh, semantic dedup) stops
    seeing deleted vectors immediately; ``compact_ivf_store`` later
    drops the rows physically."""
    from datapoints_csv_extractor_spark.operators.dedup import (
        _read_manifest,
        store_tombstones,
    )

    base = os.path.join(index_dir, "assignments")
    ingests = _read_manifest(index_dir)
    if not ingests:
        out = spark.read.parquet(base)
    else:
        out = (
            spark.read.option("basePath", base)
            .parquet(*[os.path.join(base, f"ingest={i}") for i in ingests])
            .drop("ingest")
        )
    dead = store_tombstones(spark, index_dir, id_col="vec_id")
    if dead is not None:
        out = out.join(dead, "vec_id", "left_anti")
    return out


def _write_ivf_ingest(assigned: DataFrame, index_dir: str, ingest_id: str) -> None:
    """One committed fold of the assignment store: write the shard's
    rows (cell-clustered, one file per cell) under a private
    ``ingest=<id>`` directory — overwrite, so a replayed id rewrites
    the same bytes — then publish it in the manifest (idempotent:
    commit-at-most-once under the catalog lock)."""
    from datapoints_csv_extractor_spark.operators.dedup import _commit_manifest

    assigned.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(index_dir, "assignments", f"ingest={ingest_id}"))
    _commit_manifest(
        index_dir,
        lambda ids: ids if ingest_id in ids else ids + [ingest_id],
    )


def build_ivf_index(
    e: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    n_train_iters: int = 2,
) -> list[list[float]]:
    """Build-once half of the IVF lifecycle: train the coarse quantizer
    and PERSIST the index so queries never retrain.

    Writes two parquet tables under ``index_dir``:

    - ``centroids``: (cell, centroid) — parameter-sized (n_centroids
      rows), read and collected by every query.
    - ``assignments``: the input rows plus their ``cell``, laid out
      ``ingest=<id>/cell=<n>`` and published through ``manifest.json``
      (the same commit protocol as the text-side band store, so
      incremental folds, compaction, and refresh all share one
      reader). A query probing n_probe cells touches only
      n_probe/n_centroids of the files — vector-space partition
      pruning, the same mechanism as date-partition pruning on a fact
      table. At 100 TB this runs once at ingest (or incrementally per
      shard: assignment is a map-only column add against the stored
      centroids); queries amortize it forever.

    Returns the trained centroids (parameter-sized, for callers that
    want to assign new shards without re-reading the centroid table).
    """
    centroids = train_ivf_centroids(e, n_centroids, n_train_iters)
    spark = e.sparkSession
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    # repartition(1), not coalesce(1): coalescing a driver-local
    # createDataFrame frame makes ONE task drain all ~32 Python
    # partitions SERIALLY (one Python-worker round-trip each, ~4 s
    # measured); the 1-task shuffle runs the map side in parallel.
    cent_df.repartition(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    assigned = _spread(e).withColumn(
        "cell", _nearest_cell(F.col("embedding"), centroids)
    )
    _write_ivf_ingest(assigned, index_dir, "base")
    # A REBUILD over an existing store replaces it wholesale: the
    # manifest resets to just the fresh base fold and superseded
    # ingest directories are garbage-collected.
    from datapoints_csv_extractor_spark.operators.dedup import _commit_manifest

    _commit_manifest(index_dir, lambda ids: ["base"])
    import shutil

    for d in os.scandir(os.path.join(index_dir, "assignments")):
        if d.is_dir() and d.name.startswith("ingest=") and d.name != "ingest=base":
            shutil.rmtree(d.path, ignore_errors=True)
    return centroids


def ann_ivf_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Query-once half of the IVF lifecycle: top-k over a PERSISTED
    index, with zero training work in the plan.

    Reads the parameter-sized centroid table, picks the ``n_probe``
    nearest cells driver-side, then scans ONLY those cell partitions of
    the assignment table (``cell`` is a partition column, so the filter
    prunes at file-listing time — verified by the plan test). The scan
    is a no-shuffle filter + TakeOrdered.
    """
    centroids = dict(enumerate(read_ivf_centroids(spark, index_dir)))
    probe_cells = [
        cid
        for cid, _ in sorted(
            ((cid, _cos_list(query_vec, c)) for cid, c in centroids.items()),
            key=lambda t: -t[1],
        )[:n_probe]
    ]
    assigned = read_ivf_assignments(spark, index_dir)
    qlit = _f64_lit(float(x) for x in query_vec)
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    out = assigned.where(F.col("cell").isin(probe_cells))
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _default_index_dir(sf_dir: str) -> str:
    """Per-dataset scratch location for the driver-facing indexed
    query (build-once, query-many). The key includes the embeddings
    table's mtimes so a regenerated dataset gets a fresh index instead
    of stale cells. (A dataset restored with PRESERVED mtimes — cp -p,
    tar — keeps the old tag; delete the scratch dir to force a
    rebuild in that case.)"""
    emb = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    stamp = ""
    if os.path.exists(emb):
        stat = os.stat(emb)
        stamp = f":{stat.st_mtime_ns}:{stat.st_size}"
        if os.path.isdir(emb):
            stamp += "".join(
                f":{n}:{os.stat(os.path.join(emb, n)).st_mtime_ns}"
                for n in sorted(os.listdir(emb))
            )
    # "v2": manifest-committed assignment layout — a cache built by an
    # older round must rebuild, not read half a protocol.
    tag = hashlib.md5(f"v2:{os.path.abspath(sf_dir)}{stamp}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_ivf_{tag}")


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Driver-facing IVF ANN over the embeddings table (rows-only).

    Exercises the PERSISTED-index lifecycle: builds the index under a
    per-dataset scratch dir if absent (once), then answers from the
    stored centroids + cell-partitioned assignments — the query plan
    contains no k-means work. Results are identical to the
    self-contained ``ann_ivf_topk_df`` because the same deterministic
    training produced the stored index.
    """
    import uuid

    e = load(spark, sf_dir, "embeddings")
    index_dir = _default_index_dir(sf_dir)
    marker = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(marker):
        # Build into a private dir, then ATOMICALLY rename into the
        # cache slot: two concurrent processes (bench + driver on the
        # same sf_dir) must never interleave writes into one index —
        # exactly one rename wins, the loser discards its build and
        # reads the winner's (identical, deterministic training).
        staging = f"{index_dir}.build.{uuid.uuid4().hex[:8]}"
        build_ivf_index(e, staging)
        try:
            os.rename(staging, index_dir)
        except OSError:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            if not os.path.exists(marker):
                raise
    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    return ann_ivf_topk_from_index(
        spark,
        index_dir,
        [float(x) for x in qrow[0]],
        k=k,
        exclude_vec_id=query_vec_id,
    )


def assign_to_ivf_index(
    new_vecs: DataFrame, index_dir: str, ingest_id: str | None = None
) -> None:
    """Fold a NEW embedding shard into a persisted IVF index without
    retraining: read the parameter-sized centroid table, assign each
    new vector to its nearest cell (map-only, broadcast centroid
    literals — no join, no shuffle), and commit it as one
    manifest-listed ingest of the assignment store. Prior shards are
    never touched — the ANN counterpart of dedup_incremental's
    band-store append, completing the ingest-once/query-many lifecycle
    for continuously arriving embeddings. Centroid drift over many
    shards is handled by ``refresh_ivf_index`` (or full
    ``build_ivf_index`` rebuilds), not per-shard retraining.

    ``ingest_id`` makes the fold idempotent under at-least-once
    replay: the same id rewrites its own directory and commits at most
    once. Without it a fresh unique id is minted.
    """
    import uuid

    spark = new_vecs.sparkSession
    centroids = read_ivf_centroids(spark, index_dir)
    assigned = _spread(new_vecs).withColumn(
        "cell", _nearest_cell(F.col("embedding"), centroids)
    )
    _write_ivf_ingest(assigned, index_dir, ingest_id or uuid.uuid4().hex[:12])


def ivf_cell_balance(
    spark: SparkSession, index_dir: str, max_cell_size: int = 4096
) -> DataFrame:
    """Health report for the incremental IVF store, one row per cell:
    (cell, n_vecs, n_files, over) — ``over`` marks cells whose
    population exceeds ``max_cell_size``, the signal that centroid
    drift is concentrating new shards into stale cells (recall decays
    silently as whole-cell verdict matrices saturate) and a
    ``refresh_ivf_index`` is due; ``n_files`` exposes the per-shard
    append fragmentation ``compact_ivf_store`` folds away.

    Parameter-sized everywhere: one count-by-cell aggregate over the
    store (n_centroids result rows) plus a driver-side file listing of
    the manifest-listed ingest directories.
    """
    import glob as _glob

    from datapoints_csv_extractor_spark.operators.dedup import _read_manifest

    counts = {
        r["cell"]: r["n"]
        for r in read_ivf_assignments(spark, index_dir)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    base = os.path.join(index_dir, "assignments")
    ingests = _read_manifest(index_dir)
    dirs = [os.path.join(base, f"ingest={i}") for i in ingests] or [base]
    n_files: dict[int, int] = {}
    for d in dirs:
        for f in _glob.glob(os.path.join(d, "cell=*", "*.parquet")):
            cell = int(os.path.basename(os.path.dirname(f)).removeprefix("cell="))
            n_files[cell] = n_files.get(cell, 0) + 1
    return spark.createDataFrame(
        [
            (c, int(counts.get(c, 0)), int(n_files.get(c, 0)),
             bool(counts.get(c, 0) > max_cell_size))
            for c in sorted(set(counts) | set(n_files))
        ],
        "cell int, n_vecs long, n_files int, over boolean",
    )


def refresh_ivf_index(
    spark: SparkSession,
    index_dir: str,
    n_centroids: int | None = None,
    n_train_iters: int = 2,
) -> list[list[float]]:
    """OFFLINE centroid refresh for a drifted incremental IVF store:
    retrain the coarse quantizer from the STORED assignments (one scan
    of the committed store — the raw corpus is never re-read), then
    re-partition every stored vector under the new geometry as a
    single fresh fold that replaces the manifest wholesale.

    This is the drift escape hatch the per-shard append path
    deliberately lacks (standard IVF practice: assign cheaply per
    shard, retrain rarely). Offline means no concurrent readers or
    appenders during the swap: the centroid table and the assignment
    manifest cannot change in one atomic step, and a reader holding
    new centroids against old assignments would prune the wrong cells.
    Run it from the same maintenance window as ``compact_ivf_store``.

    ``n_centroids`` defaults to the stored centroid count; pass a
    larger value when the balance report shows cells over threshold
    because the corpus outgrew the cell budget (not just drifted).
    Returns the new centroids.
    """
    import shutil
    import uuid

    from datapoints_csv_extractor_spark.operators.dedup import (
        _commit_manifest_full,
        _read_manifest_full,
    )

    if n_centroids is None:
        n_centroids = len(read_ivf_centroids(spark, index_dir))
    # Snapshot the delete ledger BEFORE materializing the fold:
    # read_ivf_assignments is tombstone-filtered, so the refreshed
    # fold excludes at least these deletes — the refresh doubles as a
    # tombstone fold and clears exactly this snapshot below (a delete
    # committed mid-refresh stays listed).
    deletes_snapshot = set(_read_manifest_full(index_dir)["deletes"])
    stored = read_ivf_assignments(spark, index_dir).drop("cell").localCheckpoint()
    centroids = train_ivf_centroids(stored, n_centroids, n_train_iters)
    refresh_id = f"refresh{uuid.uuid4().hex[:8]}"
    assigned = _spread(stored).withColumn(
        "cell", _nearest_cell(F.col("embedding"), centroids)
    )
    # Order: new fold first, then centroids, then the manifest cut to
    # exactly the fold trained against them; stale folds GC'd last.
    _write_ivf_ingest(assigned, index_dir, refresh_id)
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).repartition(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    def _swap(m: dict) -> dict:
        m["ingests"] = [refresh_id]
        # The fold already excluded snapshot-time tombstones; deletes
        # committed DURING the refresh stay listed.
        m["deletes"] = [d for d in m["deletes"] if d not in deletes_snapshot]
        return m

    final = _commit_manifest_full(index_dir, _swap)
    kept = set(final["ingests"])
    kept_deletes = set(final["deletes"])
    for d in os.scandir(os.path.join(index_dir, "assignments")):
        if d.is_dir() and d.name.startswith("ingest=") and d.name.removeprefix("ingest=") not in kept:
            shutil.rmtree(d.path, ignore_errors=True)
    tomb_root = os.path.join(index_dir, "tombstones")
    if os.path.isdir(tomb_root):
        for d in os.scandir(tomb_root):
            if d.is_dir() and d.name.removeprefix("delete=") not in kept_deletes:
                shutil.rmtree(d.path, ignore_errors=True)
    return centroids


def refresh_ivf_index_if_unbalanced(
    spark: SparkSession,
    index_dir: str,
    max_cell_size: int = 4096,
    n_train_iters: int = 2,
) -> bool:
    """Maintenance-window driver: consult the balance report and
    refresh only when some cell is over threshold, growing the cell
    budget so the refreshed store targets ~half-full cells. Returns
    whether a refresh ran (idempotent when balanced — the common
    case, costing one parameter-sized aggregate)."""
    import math

    report = ivf_cell_balance(spark, index_dir, max_cell_size).collect()
    if not any(r["over"] for r in report):
        return False
    total = sum(r["n_vecs"] for r in report)
    current = len(read_ivf_centroids(spark, index_dir))
    target = max(current, math.ceil(2 * total / max_cell_size))
    refresh_ivf_index(spark, index_dir, n_centroids=target, n_train_iters=n_train_iters)
    return True


def q_knn_multi(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """Batched exact kNN: top-``k`` cosine neighbors for a SET of
    query vectors (vec_id < ``n_queries``) in ONE corpus scan — the
    retrieval shape evaluation harnesses run (many probes against one
    index) where per-query scans would cost Q passes.

    The query side is parameter-sized (``n_queries`` rows) and joins
    as a broadcast nested loop — each corpus row scores against the
    broadcast probe set, so the fact table is still scanned exactly
    once with no shuffle before the per-query top-k window. Ties break
    on vec_id over the rounded score (engine-independent cut).
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("query_embedding"),
    )
    cos = F.round(cosine(F.col("embedding"), F.col("query_embedding")), 4)
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_vec_id"))
        .select(
            "query_vec_id",
            "vec_id",
            "label",
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "rank", "vec_id", "label", "cosine")
    )


def q_semantic_decontamination(
    spark: SparkSession,
    sf_dir: str,
    eval_mod: int = 20,
    threshold: float = 0.45,
    max_eval_id: int = 2_000,
) -> DataFrame:
    """Embedding-space decontamination report: for every training
    (corpus) vector, its maximum cosine to ANY held-out benchmark
    vector, plus a contamination flag at ``threshold`` — the
    embedding-side complement of the n-gram q_decontamination check
    (a paraphrased eval item shares no 8-gram but sits right on top
    of the benchmark in embedding space).

    The benchmark side is ``vec_id % eval_mod == 0`` — a deterministic
    stand-in for the real-world "small, fixed eval suite". That side
    is broadcast: at 100 TB the corpus is the big side and the eval
    suite stays thousands of rows, so the plan is one corpus scan x
    broadcast nested-loop scoring + a corpus-keyed partial max — no
    shuffle of the corpus beyond the final per-vector aggregate, and
    no index to build or invalidate. Scoring stays JVM-side
    (zip_with/aggregate fold, the q_knn_brute_force arithmetic) so the
    rounded scores are engine-exact vs the oracle.
    """
    e = load(spark, sf_dir, "embeddings")
    # Norms are factored out per ROW (not recomputed per pair):
    # sqrt(sum(x^2)) of the same vector is the same double wherever
    # it's computed, so dot/(nc*ne) is bit-identical to the textbook
    # per-pair cosine while doing |corpus|+|eval| norm folds instead
    # of |corpus|x|eval| (measured 1.6x on this query at sf0.1).
    # The benchmark side is BOUNDED by contract (max_eval_id), not
    # just a fraction of the table: a real eval suite is fixed-size
    # while the corpus grows without limit, and the bound is what
    # keeps the scoring work linear in the corpus — with both sides
    # growing (fraction semantics) the sf1 probe once measured 15x
    # wall for 10x data; with the bound, the round-8 fresh-JVM probe
    # records ~2.0x wall / 2.5x task-time for 10x data (in-session
    # round-7 numbers ran up to 4.25x from accumulated session
    # state, which is why the probe now isolates — see
    # bench._sf1_probe_main).
    ev = e.where(
        (F.col("vec_id") % eval_mod == 0) & (F.col("vec_id") < max_eval_id)
    ).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("eval_embedding"),
        _norm(F.col("embedding")).alias("eval_norm"),
    )
    corpus = e.where(
        (F.col("vec_id") % eval_mod != 0) | (F.col("vec_id") >= max_eval_id)
    ).withColumn(
        "corpus_norm", _norm(F.col("embedding"))
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("eval_embedding"))
        / (F.col("corpus_norm") * F.col("eval_norm")),
        4,
    )
    return (
        corpus.join(F.broadcast(ev), F.lit(True))
        .select("vec_id", "label", cos.alias("cosine"))
        .groupBy("vec_id", "label")
        .agg(F.max("cosine").alias("max_eval_cosine"))
        .select(
            "vec_id",
            "label",
            "max_eval_cosine",
            (F.col("max_eval_cosine") >= threshold).alias("contaminated"),
        )
        .orderBy("vec_id")
    )


def _dcg_discounts(k: int) -> list[float]:
    """1/log2(rank+1) for ranks 1..k, materialized driver-side so both
    engines consume IDENTICAL decimal literals — Spark's log2 and
    DuckDB's differ in the last ulp (measured), which would leak
    through any fold no matter how carefully ordered."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def q_retrieval_metrics(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Retrieval-quality report for the exact top-k ranking:
    precision@k, recall@k, MRR, and nDCG@k per probe query, with
    same-label membership as the (binary) relevance judgment — the
    evaluation harness run before trusting any retrieval stack, here
    measuring the ceiling the ANN paths approximate
    (q_ann_recall_report measures how closely they hit it).

    The ranking is q_knn_multi's: rounded-cosine desc, vec_id
    tie-break — engine-deterministic. DCG folds rank-ordered terms
    sequentially (collect_list -> array_sort -> aggregate); the
    discount table is a shared literal array (see _dcg_discounts), so
    every double matches the oracle bit-for-bit. All per-query state
    is k-sized; the corpus-side relevant counts are one broadcast-
    joined aggregate — nothing driver-side scales with the corpus."""
    e = load(spark, sf_dir, "embeddings")
    # Per-row norm factoring — bit-identical to per-pair cosine, see
    # q_semantic_decontamination.
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("query_embedding"),
        _norm(F.col("embedding")).alias("query_norm"),
    )
    disc = F.array(*[F.lit(d) for d in _dcg_discounts(k)])
    cos = F.round(
        _dot(F.col("embedding"), F.col("query_embedding"))
        / (_norm(F.col("embedding")) * F.col("query_norm")),
        4,
    )
    from pyspark.sql import Window

    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_vec_id")
    ).select(
        "query_vec_id",
        "query_label",
        "vec_id",
        "label",
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn(
            "rel", (F.col("label") == F.col("query_label")).cast("int")
        )
    )
    # Corpus-wide relevant count per query (excluding the query row),
    # for recall@k and the ideal DCG depth.
    label_sizes = e.groupBy("label").agg(F.count("*").alias("n_label"))
    per_q = (
        topk.groupBy("query_vec_id", "query_label")
        .agg(
            F.sum("rel").alias("hits"),
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias(
                "first_rel_rank"
            ),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "rank",
                        (F.col("rel") * F.element_at(disc, F.col("rank"))).alias(
                            "term"
                        ),
                    )
                )
            ).alias("terms"),
        )
        .join(
            label_sizes, F.col("query_label") == F.col("label")
        )
        .withColumn("n_relevant", F.col("n_label") - 1)
    )
    dcg = F.aggregate(
        F.col("terms"), F.lit(0.0).cast("double"), lambda a, t: a + t["term"]
    )
    idcg = F.aggregate(
        F.slice(disc, 1, F.least(F.lit(k), F.col("n_relevant"))),
        F.lit(0.0).cast("double"),
        lambda a, d: a + d,
    )
    return per_q.select(
        "query_vec_id",
        "query_label",
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.round(F.col("hits") / k, 4).alias("precision_at_k"),
        F.when(
            F.col("n_relevant") > 0,
            F.round(F.col("hits") / F.col("n_relevant"), 4),
        ).otherwise(F.lit(0.0)).alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)), 4
        ).alias("mrr"),
        F.when(F.col("n_relevant") > 0, F.round(dcg / idcg, 4))
        .otherwise(F.lit(0.0)).alias("ndcg_at_k"),
    ).orderBy("query_vec_id")


def q_embedding_truncation_recall(
    spark: SparkSession,
    sf_dir: str,
    dims: tuple = (8, 16, 32, 64),
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """Dimension-truncation recall report (the Matryoshka question):
    for each prefix length d, how much of the FULL-dimension exact
    top-k does a d-dim prefix search recover? The measurement that
    decides whether truncated embeddings can serve the first-stage
    retrieval at a fraction of the memory/bandwidth — reported as
    recall@k averaged over the probe set, one row per d.

    One broadcast scoring join computes ALL prefix cosines per pair
    (slice + fold per d — the pair row is read once), a per-(probe, d)
    window takes top-k, collect-to-array + array_intersect against
    the full-dim list sizes the overlap, and the average is an exact
    integer sum divided once. Per-query state is k-sized; nothing
    driver-side scales with the corpus."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("query_embedding"),
    )
    from pyspark.sql import Window

    full_dim = max(dims)
    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_vec_id")
    )
    per_dim = F.array(
        *[
            F.struct(
                F.lit(d).alias("dim"),
                F.round(
                    _dot(
                        F.slice(F.col("embedding"), 1, d),
                        F.slice(F.col("query_embedding"), 1, d),
                    )
                    / (
                        _norm(F.slice(F.col("embedding"), 1, d))
                        * _norm(F.slice(F.col("query_embedding"), 1, d))
                    ),
                    4,
                ).alias("cosine"),
            )
            for d in dims
        ]
    )
    exploded = scored.select(
        "query_vec_id", "vec_id", F.explode(per_dim).alias("s")
    ).select(
        "query_vec_id",
        "vec_id",
        F.col("s.dim").alias("dim"),
        F.col("s.cosine").alias("cosine"),
    )
    w = Window.partitionBy("query_vec_id", "dim").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    topk = (
        exploded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .groupBy("query_vec_id", "dim")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
    )
    full = topk.where(F.col("dim") == full_dim).select(
        "query_vec_id", F.col("ids").alias("full_ids")
    )
    hits = (
        topk.join(full, "query_vec_id")
        .select(
            "dim",
            F.size(F.array_intersect("ids", "full_ids")).alias("n_hit"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("n_hit").alias("hits"),
        )
    )
    return hits.select(
        "dim",
        "n_queries",
        F.round(
            F.col("hits") / (F.col("n_queries") * k), 4
        ).alias("avg_recall_at_k"),
    ).orderBy("dim")


def build_lsh_index(
    e: DataFrame, index_dir: str, n_bits: int = 8
) -> None:
    """Build-once half of the hyperplane-LSH lifecycle: bucket every
    vector (map-only — the hyperplanes are deterministic literals, so
    no model table is even needed) and persist the assignment table
    PARTITIONED BY bucket. A query then reads only its probe buckets
    via partition pruning — the same layout payoff as the IVF index,
    with the multi-probe set (bucket ± one bit) replacing n_probe
    cells. ``meta`` records dim/n_bits so the query path derives the
    identical hyperplane family.
    """
    import json

    dim = len(_require_row(e.select("embedding").first(), "any embedding row")[0])
    assigned = e.withColumn("bucket", lsh_bucket(F.col("embedding"), dim, n_bits))
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(index_dir, "assignments")
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"dim": dim, "n_bits": n_bits}, f)


def ann_lsh_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Query-once half: compute the query's bucket driver-side from
    the stored hyperplane parameters, scan ONLY the multi-probe
    partitions (bucket and its one-bit neighbors — n_bits+1 of 2^n_bits
    partitions), and exactly re-score. No banding work over the corpus
    appears in the plan."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    dim, n_bits = meta["dim"], meta["n_bits"]
    if len(query_vec) != dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {dim}")
    qbucket = 0
    for j, row in enumerate(_hyperplanes(dim, n_bits)):
        d = sum(float(x) * y for x, y in zip(query_vec, row))
        if d > 0:
            qbucket += 1 << j
    probes = [qbucket] + [qbucket ^ (1 << j) for j in range(n_bits)]
    assigned = spark.read.parquet(os.path.join(index_dir, "assignments"))
    qlit = _f64_lit(float(x) for x in query_vec)
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    out = assigned.where(F.col("bucket").isin(probes))
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def semantic_dedup(
    e: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.45,
    n_train_iters: int = 2,
    max_cell_size: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embedding space, compare
    pairs ONLY within a cluster, and drop every vector that has a
    higher-priority (lower vec_id) neighbor above the cosine
    threshold.

    Scale shape: the cluster id is the blocking key — pair work is
    quadratic only within a cell, and cells hold ~n/k vectors, so the
    operator's cost is n^2/k instead of n^2. That is the paper's own
    scaling lever: k grows with the corpus (they use 50k clusters for
    LAION-scale data; callers here pass n_centroids ~ n / desired
    cell size). Everything else is one shuffle on the cell key; the
    centroid table is parameter-sized and rides along as a broadcast
    literal (see _nearest_cell — assignment is map-only, no join).

    Hot-cell guard: a degenerate centroid (e.g. a near-duplicate
    flood, or too-few centroids for the corpus) would hand
    applyInPandas an unbounded group — the same single-key failure
    mode as a hot LSH bucket. Cells over ``max_cell_size`` are salted
    into ceil(size/max_cell_size) deterministic sub-blocks
    (vec_id-hash mod); comparisons then happen within a sub-block
    only. That bounds worst-case group memory at the cost of recall
    ACROSS sub-blocks of an oversized cell — the standard banding
    trade, and the doc-level answer is still "resize n_centroids".

    Returns (vec_id, cell, keep, rep_id): keep=false rows name the
    surviving representative rep_id (the smallest-id neighbor above
    threshold in the same cell/sub-block).
    """
    centroids = train_ivf_centroids(e, n_centroids, n_train_iters)
    # Materialize the assignment once: cell_sizes is built as a
    # broadcast (its own job), so a lazy `assigned` would re-run the
    # per-row nearest-cell fold for the broadcast build AND the main
    # plan — the same write-the-assignment-table step the incremental
    # variant (and SemDeDup production practice) already takes.
    assigned = (
        _spread(e.select("vec_id", "embedding"))
        .withColumn("cell", _nearest_cell(F.col("embedding"), centroids))
        .localCheckpoint()
    )
    cell_sizes = assigned.groupBy("cell").agg(F.count("*").alias("cell_n"))
    n_sub = F.greatest(
        F.ceil(F.col("cell_n") / F.lit(max_cell_size)), F.lit(1)
    ).cast("int")
    assigned = (
        assigned.join(F.broadcast(cell_sizes), "cell")
        .withColumn(
            "sub",
            F.pmod(F.xxhash64(F.col("vec_id")), n_sub).cast("int"),
        )
        .drop("cell_n")
    )

    # Verdicts are computed per cell with ONE gram-matrix product via
    # applyInPandas — the shape SemDeDup itself runs per cluster. A
    # pair-join formulation ships both embeddings once per candidate
    # pair (~|cell|^2 vector copies through the shuffle) and scores
    # each pair with an interpreted HOF fold; grouping ships every
    # vector exactly once and scores the whole cell as N_hat @ N_hat.T
    # in C (measured 7.6 s -> ~1.5 s at sf0.1). The shuffle key is the
    # cell id, so executor memory bounds cell size at ~n/k rows —
    # exactly the knob (k grows with the corpus) the operator already
    # documents.
    def _cell_verdicts(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        ids = pdf["vec_id"].to_numpy()
        if n == 1:
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "cell": pdf["cell"].to_numpy(),
                    "keep": np.array([True]),
                    "rep_id": pd.array([None], dtype="Int64"),
                }
            )
        m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sims = (m / norms[:, None]) @ (m / norms[:, None]).T
        # Upper triangle only: column j's candidates are rows i < j.
        above = np.triu(sims >= threshold, k=1)
        has_rep = above.any(axis=0)
        # argmax over a boolean column returns the FIRST True row —
        # ids are sorted, so that is the smallest qualifying vec_id.
        rep_idx = above.argmax(axis=0)
        rep = pd.Series(ids[rep_idx]).astype("Int64")
        rep[~has_rep] = pd.NA
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].to_numpy(),
                "keep": ~has_rep,
                "rep_id": rep,
            }
        )

    # AQE would coalesce this small-by-bytes shuffle to one task and
    # serialize the whole Arrow stage; see pin_grouped_parallelism.
    from .skew import pin_grouped_parallelism

    return (
        pin_grouped_parallelism(assigned, "cell", "sub")
        .groupBy("cell", "sub")
        .applyInPandas(
            _cell_verdicts, "vec_id long, cell int, keep boolean, rep_id long"
        )
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing SemDeDup verdict table (rows-only: the k-means
    assignment is not expressible in the DuckDB oracle; pytest pins
    planted-duplicate behavior instead)."""
    return semantic_dedup(load(spark, sf_dir, "embeddings"))


def semantic_dedup_incremental(
    new_vecs: DataFrame,
    index_dir: str,
    threshold: float = 0.45,
    append: bool = True,
    ingest_id: str | None = None,
) -> DataFrame:
    """Dedup a NEW embedding shard against a persisted IVF index
    without recomputing the stored corpus — the semantic counterpart
    of ``dedup_incremental``'s band store (and of the reference's
    fetch-known/create-missing catalog loop).

    Per shard: a map-only nearest-cell assignment against the stored
    centroid table (broadcast literals, no join), then ONE cogrouped
    applyInPandas per cell comparing each new vector against (a) the
    stored vectors of that cell and (b) earlier new vectors of the
    same shard — both as whole-cell matrix products. Stored cells the
    shard never touches are pruned at the parquet scan (the
    cell-partitioned layout), so per-shard cost is
    O(|shard| x cell population), independent of corpus size.

    Verdicts: (vec_id, cell, keep, rep_id, rep_kind) where rep_kind is
    'known' (duplicate of a stored vector) or 'new' (duplicate of an
    earlier vector in the same shard). With ``append=True`` the KEPT
    vectors fold into the index as one manifest-committed ingest
    (prior shards untouched), so the index stays exactly the
    deduplicated corpus; ``ingest_id`` makes the fold idempotent under
    at-least-once replay (the shard's own committed rows are excluded
    from the 'known' side, its directory is rewritten, and the
    manifest commits at most once — same contract as
    ``dedup_incremental``).
    """
    import uuid

    from datapoints_csv_extractor_spark.operators.dedup import _read_manifest

    spark = new_vecs.sparkSession
    ingest_id = ingest_id or uuid.uuid4().hex[:12]
    centroids = read_ivf_centroids(spark, index_dir)
    new_assigned = (
        _spread(new_vecs.select("vec_id", "embedding"))
        .withColumn("cell", _nearest_cell(F.col("embedding"), centroids))
        .localCheckpoint()
    )
    # Parameter-sized cell list (<= n_centroids) prunes the stored
    # assignment scan to only the partitions this shard touches.
    # On replay, the shard's own earlier fold is excluded from the
    # known side so verdicts are reproduced, not self-polluted.
    cells = [r["cell"] for r in new_assigned.select("cell").distinct().collect()]
    committed = [i for i in _read_manifest(index_dir) if i != ingest_id]
    base = os.path.join(index_dir, "assignments")
    if committed:
        stored_all = (
            spark.read.option("basePath", base)
            .parquet(*[os.path.join(base, f"ingest={i}") for i in committed])
            .drop("ingest")
        )
    else:
        # Pre-manifest store (backward compat): read the flat layout.
        stored_all = spark.read.parquet(base)
    from datapoints_csv_extractor_spark.operators.dedup import (
        store_tombstones,
    )

    dead = store_tombstones(spark, index_dir, id_col="vec_id")
    if dead is not None:
        # Deleted/redacted vectors must stop acting as dup
        # representatives immediately (rows drop physically at the
        # next compact_ivf_store).
        stored_all = stored_all.join(dead, "vec_id", "left_anti")
    stored = stored_all.where(F.col("cell").isin(cells)).select(
        "cell", "vec_id", "embedding"
    )

    def _verdicts(new_pdf, known_pdf):
        import numpy as np
        import pandas as pd

        if len(new_pdf) == 0:
            return pd.DataFrame(
                columns=["vec_id", "cell", "keep", "rep_id", "rep_kind"]
            )
        new_pdf = new_pdf.sort_values("vec_id").reset_index(drop=True)
        ids = new_pdf["vec_id"].to_numpy()
        m = np.array(new_pdf["embedding"].tolist(), dtype=np.float64)
        mn = np.sqrt((m * m).sum(axis=1))
        mn[mn == 0.0] = 1.0
        m_hat = m / mn[:, None]

        rep = pd.array([None] * len(ids), dtype="Int64")
        kind = pd.array([None] * len(ids), dtype="string")

        if len(known_pdf):
            k = np.array(known_pdf["embedding"].tolist(), dtype=np.float64)
            kn = np.sqrt((k * k).sum(axis=1))
            kn[kn == 0.0] = 1.0
            sims = m_hat @ (k / kn[:, None]).T
            kids = known_pdf["vec_id"].to_numpy()
            above = sims >= threshold
            for i in np.nonzero(above.any(axis=1))[0]:
                rep[i] = int(kids[above[i]].min())
                kind[i] = "known"

        intra = np.triu(m_hat @ m_hat.T >= threshold, k=1)
        for j in np.nonzero(intra.any(axis=0))[0]:
            if rep[j] is pd.NA or rep[j] is None:
                rep[j] = int(ids[intra[:, j].argmax()])
                kind[j] = "new"

        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": new_pdf["cell"].to_numpy(),
                "keep": pd.isna(rep),
                "rep_id": rep,
                "rep_kind": kind,
            }
        )

    # Pin both cogroup sides (same rationale as pin_grouped_parallelism
    # for groupBy: AQE would coalesce the tiny shuffles to one task).
    from .skew import pin_grouped_parallelism

    verdicts = (
        pin_grouped_parallelism(new_assigned, "cell")
        .groupBy("cell")
        .cogroup(pin_grouped_parallelism(stored, "cell").groupBy("cell"))
        .applyInPandas(
            _verdicts,
            "vec_id long, cell int, keep boolean, rep_id long, rep_kind string",
        )
        .localCheckpoint()
    )
    if append:
        survivors = new_assigned.join(
            verdicts.where("keep").select("vec_id"), "vec_id"
        )
        _write_ivf_ingest(survivors, index_dir, ingest_id)
    return verdicts


def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing (rows-only): split the embeddings table into two
    'daily shards' by vec_id, build the IVF index from shard 1, and
    return shard 2's semantic-dedup verdicts against it — shard 1's
    vectors are never re-scored. Scratch index per call (mkdtemp), like
    q_dedup_incremental's scratch band store."""
    import shutil

    index_dir = tempfile.mkdtemp(prefix="spark_graft_ivf_")
    try:
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cut = e.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
        build_ivf_index(e.where(F.col("vec_id") <= cut), index_dir)
        return semantic_dedup_incremental(
            e.where(F.col("vec_id") > cut), index_dir, append=False
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-vector ANN with ADC scoring
# ---------------------------------------------------------------------------
#
# The third ANN family next to hyperplane-LSH (bucket pruning) and IVF
# (cell pruning): PQ attacks the MEMORY axis. Each vector is stored as
# m sub-quantizer codes (m bytes at k<=256), a 64-dim float64 vector
# compressing 512 B -> 8 B; at 100 TB of embeddings that is the
# difference between an index that fits in cluster RAM and one that
# does not. Query-time scoring is ADC (asymmetric distance
# computation): the query stays exact, each candidate's distance is a
# sum of m table lookups — the (m x k) lookup table is computed once
# driver-side per query (parameter-sized, like a literal) and
# broadcast. Vectors are L2-normalized before splitting, so ADC's
# squared-L2 ranking is equivalent to cosine ranking (||a-b||^2 =
# 2 - 2cos on the unit sphere).

def train_pq_codebooks(
    e: DataFrame, m: int = 8, k: int = 16, n_iters: int = 3
) -> list[list[list[float]]]:
    """Deterministic distributed k-means per PQ subspace.

    ``codebooks[j][c]`` is centroid ``c`` of subspace ``j`` (dim/m
    floats). All m subspaces train in the SAME Lloyd pass: one Arrow
    scan per iteration emits (subspace, cell, n, partial-sum) rows for
    every subspace at once — m independent k-means for the cost of
    one — and a groupBy(subspace, cell) combine whose shuffle carries
    ~m*k tiny rows per batch. Init is the first k vectors by vec_id
    (deterministic, no RNG), mirroring ``train_ivf_centroids``.
    The driver only ever holds the m*k*(dim/m) codebook parameters.
    """
    first = e.where(F.col("vec_id") < k).select("vec_id", "embedding").collect()
    init = [
        [float(x) for x in r.embedding] for r in sorted(first, key=lambda r: r.vec_id)
    ]
    dim = len(init[0])
    if dim % m != 0:
        raise ValueError(f"PQ subspace count m={m} must divide dim={dim}")
    sub = dim // m

    def _normed(vec_list):
        import numpy as np

        a = np.array(vec_list, dtype=np.float64)
        n = np.sqrt((a * a).sum(axis=1))
        n[n == 0.0] = 1.0
        return a / n[:, None]

    import numpy as _np

    init_n = _normed(init)
    codebooks = [
        [list(map(float, init_n[c, j * sub : (j + 1) * sub])) for c in range(k)]
        for j in range(m)
    ]

    # Same iterative-training persist as train_ivf_centroids: one
    # cached scan feeds every Lloyd pass.
    vecs = _spread(e.select("embedding")).persist()
    schema = "sub int, cell int, n long, " + ", ".join(
        f"s{i} double" for i in range(sub)
    )
    cols = ["sub", "cell", "n"] + [f"s{i}" for i in range(sub)]
    for _ in range(n_iters):
        cb_now = [[list(c) for c in book] for book in codebooks]

        def _partials(batches, cb=cb_now):
            import numpy as np
            import pandas as pd

            books = np.array(cb, dtype=np.float64)  # (m, k, sub)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                nrm = np.sqrt((mat * mat).sum(axis=1))
                nrm[nrm == 0.0] = 1.0
                mat = mat / nrm[:, None]
                rows = []
                for j in range(books.shape[0]):
                    sv = mat[:, j * books.shape[2] : (j + 1) * books.shape[2]]
                    # (n x k) squared-L2 via the expansion trick
                    d2 = (
                        (sv * sv).sum(axis=1)[:, None]
                        - 2.0 * sv @ books[j].T
                        + (books[j] * books[j]).sum(axis=1)[None, :]
                    )
                    cells = d2.argmin(axis=1)
                    for c in np.unique(cells):
                        sel = sv[cells == c]
                        rows.append([j, int(c), len(sel), *sel.sum(axis=0)])
                yield pd.DataFrame(rows, columns=cols)

        sums = (
            vecs.mapInPandas(_partials, schema)
            .groupBy("sub", "cell")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(sub)],
            )
            .collect()
        )
        by_key = {(r["sub"], r["cell"]): r for r in sums}
        codebooks = [
            [
                [by_key[(j, c)][f"s{i}"] / by_key[(j, c)]["n"] for i in range(sub)]
                if (j, c) in by_key
                else codebooks[j][c]
                for c in range(k)
            ]
            for j in range(m)
        ]
    vecs.unpersist()
    return codebooks


def pq_encode(e: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Encode every vector to its m sub-quantizer codes: one
    Arrow-batched map-only pass (codebooks broadcast in the closure),
    emitting (vec_id, label, codes array<int>). This is the table a
    100 TB deployment persists INSTEAD of the raw embeddings."""
    m = len(codebooks)
    sub = len(codebooks[0][0])

    def _enc(batches):
        import numpy as np
        import pandas as pd

        books = np.array(codebooks, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0.0] = 1.0
            mat = mat / nrm[:, None]
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sv = mat[:, j * sub : (j + 1) * sub]
                d2 = (
                    (sv * sv).sum(axis=1)[:, None]
                    - 2.0 * sv @ books[j].T
                    + (books[j] * books[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "codes": [list(map(int, c)) for c in codes],
                }
            )

    return _spread(e.select("vec_id", "label", "embedding")).mapInPandas(
        _enc, "vec_id long, label int, codes array<int>"
    )


def _adc_lut(query_vec: list[float], codebooks: list[list[list[float]]]) -> list[float]:
    """Flat (m*k) table of squared-L2 distances from each query
    subvector to each sub-centroid — tiny, computed driver-side."""
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    n = float(np.sqrt((q * q).sum())) or 1.0
    q = q / n
    books = np.array(codebooks, dtype=np.float64)  # (m, k, sub)
    m, k, sub = books.shape
    lut = np.empty((m, k), dtype=np.float64)
    for j in range(m):
        diff = books[j] - q[j * sub : (j + 1) * sub][None, :]
        lut[j] = (diff * diff).sum(axis=1)
    return [float(x) for x in lut.reshape(-1)]


def pq_topk_df(
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ADC top-k over the encoded table: score = sum of m JVM-side
    ``element_at`` lookups into the broadcast flat lookup table —
    no Python in the scoring path, no shuffle but the TakeOrdered.
    Returns ascending approximate squared-L2 (= 2-2cos order)."""
    n_k = len(codebooks[0])
    lut = _adc_lut(query_vec, codebooks)
    lut_lit = _f64_lit(lut)
    dist = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, j: F.element_at(lut_lit, (j * F.lit(n_k) + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = encoded
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", "label", F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k)
    )


def pq_topk_rerank(
    encoded: DataFrame,
    source: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    rerank_factor: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ADC prefilter + exact re-rank: take ``rerank_factor * k``
    candidates by ADC, fetch ONLY those raw vectors from ``source``
    (an isin filter over a parameter-sized candidate list — pushed to
    the parquet scan), and exactly cosine-score them. The standard
    two-stage PQ serving shape: the compressed table absorbs the full
    scan, the expensive exact pass touches ~k rows."""
    cand = [
        r["vec_id"]
        for r in pq_topk_df(
            encoded, query_vec, codebooks, k=rerank_factor * k,
            exclude_vec_id=exclude_vec_id,
        ).collect()
    ]
    qlit = _f64_lit(float(x) for x in query_vec)
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    return (
        source.where(F.col("vec_id").isin(cand))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def build_pq_index(
    e: DataFrame, index_dir: str, m: int = 8, k: int = 16, n_iters: int = 3
) -> None:
    """Build-once half of the PQ lifecycle: train codebooks, encode
    the corpus, persist codes parquet + codebook meta. The codes table
    is the only per-vector state (m ints/vector)."""
    import json

    codebooks = train_pq_codebooks(e, m=m, k=k, n_iters=n_iters)
    pq_encode(e, codebooks).write.mode("overwrite").parquet(
        os.path.join(index_dir, "codes")
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"m": m, "k": k, "codebooks": codebooks}, f)


def ann_pq_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    source: DataFrame | None = None,
    rerank_factor: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Query-once half: load codebooks (parameter-sized), ADC-scan the
    stored codes, optionally exact-re-rank against ``source``. No
    training stage appears in the query plan."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    encoded = spark.read.parquet(os.path.join(index_dir, "codes"))
    if source is None:
        return pq_topk_df(
            encoded, query_vec, meta["codebooks"], k=k, exclude_vec_id=exclude_vec_id
        )
    return pq_topk_rerank(
        encoded, source, query_vec, meta["codebooks"], k=k,
        rerank_factor=rerank_factor, exclude_vec_id=exclude_vec_id,
    )


def q_ann_pq_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Driver-facing: PQ(8x16) + ADC + exact re-rank top-k neighbors
    of vec 0 (rows-only: k-means training is not oracle-expressible;
    recall vs the brute-force twin is pinned in pytest)."""
    e = load(spark, sf_dir, "embeddings")
    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    qvec = [float(x) for x in qrow[0]]
    codebooks = train_pq_codebooks(e, m=8, k=16, n_iters=2)
    encoded = pq_encode(e, codebooks)
    return pq_topk_rerank(
        encoded, e, qvec, codebooks, k=k, exclude_vec_id=query_vec_id
    )


def pq_topk_multi(
    encoded: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """Batched PQ serving: ADC top-k for a SET of queries in ONE scan
    of the compressed codes — ``q_knn_multi``'s shape moved onto the
    PQ index. Each query's lookup table is driver-computed
    (parameter-sized) and all Q tables ship as one broadcast literal;
    every code row scores against all Q via JVM element_at lookups
    (cost m lookups x Q per row, still no float vector math), then a
    per-query top-k window cuts. The codes table is scanned exactly
    once regardless of Q; compare Q separate scans for the serving
    loop an evaluation harness runs."""
    from pyspark.sql import Window

    n_k = len(codebooks[0])
    luts = F.array(
        *[
            F.array(*[F.lit(x) for x in _adc_lut(vec, codebooks)])
            for _, vec in queries
        ]
    )
    qids = F.array(*[F.lit(int(qid)) for qid, _ in queries])
    qi = F.col("qi")
    lut_q = F.element_at(luts, qi + 1)
    dist = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, j: F.element_at(lut_q, (j * F.lit(n_k) + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        encoded.select(
            "vec_id",
            "label",
            "codes",
            F.explode(F.sequence(F.lit(0), F.lit(len(queries) - 1))).alias("qi"),
        )
        .where(F.col("vec_id") != F.element_at(qids, qi + 1).cast("long"))
        .select(
            F.element_at(qids, qi + 1).alias("query_vec_id"),
            "vec_id",
            "label",
            F.round(dist, 6).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "rank", "vec_id", "label", "adc_dist")
    )


def q_ann_pq_multi(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Driver-facing: batched ADC top-k for vec_ids < n_queries over
    the PQ-encoded corpus (rows-only; single-query consistency is
    pinned in pytest)."""
    e = load(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows
    )
    codebooks = train_pq_codebooks(e, m=8, k=16, n_iters=2)
    encoded = pq_encode(e, codebooks)
    return pq_topk_multi(encoded, queries, codebooks, k=k)


def q_hybrid_rrf(
    spark: SparkSession, sf_dir: str, k: int = 10, rrf_k: int = 60
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    leg and the embedding-cosine semantic leg — the standard fusion
    (score = sum over legs of 1/(rrf_k + rank)) that needs no score
    calibration between legs.

    Scale shape: each leg is already top-N truncated (one corpus scan
    + TakeOrdered each), so the fusion join and the rank windows run
    over 2N rows — parameter-sized, broadcast-joined, irrelevant at
    any corpus scale; the heavy lifting stays inside the legs, which
    keep their own 100 TB plans (BM25's pre-shuffle term filter, the
    ANN stack for the semantic leg when brute force is too dear).
    Ranks come from row_number over ROUNDED leg scores with id
    tie-break so both engines rank identically; the single-partition
    window is over <= N rows by construction.

    The id spaces join where they overlap (doc_id = vec_id for the
    synthetic corpus); a doc found by one leg only still scores via
    its one reciprocal rank — exactly RRF's contract."""
    from pyspark.sql import Window

    from datapoints_csv_extractor_spark.operators.textops import bm25_topk

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    lex = bm25_topk(docs, ["dup", "window", "merge"], k=50)
    wl = Window.partitionBy(F.lit(1)).orderBy(F.desc("bm25"), F.asc("doc_id"))
    lexr = lex.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("lex_rank")
    )

    qrow = _require_row(
        emb.where(F.col("vec_id") == 0).select("embedding").first(),
        "query vec_id=0",
    )
    qlit = _f64_lit(float(x) for x in qrow[0])
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    sem = (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(50)
    )
    ws = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    semr = sem.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(ws).cast("long").alias("sem_rank"),
    )

    fused = lexr.join(semr, "doc_id", "full_outer")
    contrib = F.coalesce(
        1.0 / (F.lit(float(rrf_k)) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        1.0 / (F.lit(float(rrf_k)) + F.col("sem_rank")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.round(contrib, 6).alias("rrf_score"),
            "lex_rank",
            "sem_rank",
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + per-cell residual product codes
# ---------------------------------------------------------------------------
#
# The composition FAISS ships as its default billion-scale index:
# the IVF coarse quantizer prunes the SCAN (a query touches
# n_probe/n_centroids of the codes), and PQ compresses what remains
# (m ints per vector instead of dim floats). Residual encoding —
# quantize x_hat - centroid(cell), not x_hat — is what makes the two
# compose: within a cell the residuals are small and concentrated, so
# the same codebook budget buys far less quantization error than
# whole-vector PQ. Serving = per-probed-cell ADC tables (driver-side,
# parameter-sized) + JVM element_at lookups over a cell-pruned
# parquet scan. All arithmetic is in the normalized-vector space, so
# ADC's squared-L2 ranking within the probe set equals cosine order.


def _train_residual_pq(
    assigned: DataFrame,
    centroids: list[list[float]],
    m: int,
    k: int,
    n_iters: int,
) -> list[list[list[float]]]:
    """Deterministic k-means per subspace over RESIDUALS
    (x_hat - centroid_hat[cell]); same one-Arrow-pass-per-iteration
    shape as ``train_pq_codebooks``, without the normalize step
    (residuals are differences, not directions). Init: the first k
    vectors' residual subvectors by vec_id."""
    import numpy as np

    dim = len(centroids[0])
    if dim % m != 0:
        raise ValueError(f"PQ subspace count m={m} must divide dim={dim}")
    sub = dim // m
    c_arr = np.array(centroids, dtype=np.float64)
    c_norm = np.sqrt((c_arr * c_arr).sum(axis=1))
    c_norm[c_norm == 0.0] = 1.0
    c_hat = (c_arr / c_norm[:, None]).tolist()

    first = (
        assigned.orderBy("vec_id")
        .select("vec_id", "embedding", "cell")
        .limit(k)
        .collect()
    )
    ch = np.array(c_hat)

    def _res(row):
        x = np.array([float(v) for v in row.embedding])
        n = float(np.sqrt((x * x).sum())) or 1.0
        return x / n - ch[row.cell]

    init = [_res(r) for r in first]
    codebooks = [
        [list(map(float, init[c % len(init)][j * sub : (j + 1) * sub])) for c in range(k)]
        for j in range(m)
    ]

    vecs = _spread(assigned.select("embedding", "cell")).persist()
    schema = "sub int, cell int, n long, " + ", ".join(
        f"s{i} double" for i in range(sub)
    )
    cols = ["sub", "cell", "n"] + [f"s{i}" for i in range(sub)]
    for _ in range(n_iters):
        cb_now = [[list(c) for c in book] for book in codebooks]

        def _partials(batches, cb=cb_now, chat=c_hat):
            import numpy as np
            import pandas as pd

            books = np.array(cb, dtype=np.float64)  # (m, k, sub)
            cmat = np.array(chat, dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                nrm = np.sqrt((mat * mat).sum(axis=1))
                nrm[nrm == 0.0] = 1.0
                res = mat / nrm[:, None] - cmat[pdf["cell"].to_numpy()]
                rows = []
                for j in range(books.shape[0]):
                    sv = res[:, j * books.shape[2] : (j + 1) * books.shape[2]]
                    d2 = (
                        (sv * sv).sum(axis=1)[:, None]
                        - 2.0 * sv @ books[j].T
                        + (books[j] * books[j]).sum(axis=1)[None, :]
                    )
                    cells = d2.argmin(axis=1)
                    for c in np.unique(cells):
                        sel = sv[cells == c]
                        rows.append([j, int(c), len(sel), *sel.sum(axis=0)])
                yield pd.DataFrame(rows, columns=cols)

        sums = (
            vecs.mapInPandas(_partials, schema)
            .groupBy("sub", "cell")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{i}").alias(f"s{i}") for i in range(sub)],
            )
            .collect()
        )
        by_key = {(r["sub"], r["cell"]): r for r in sums}
        codebooks = [
            [
                [by_key[(j, c)][f"s{i}"] / by_key[(j, c)]["n"] for i in range(sub)]
                if (j, c) in by_key
                else codebooks[j][c]
                for c in range(k)
            ]
            for j in range(m)
        ]
    vecs.unpersist()
    return codebooks


def build_ivfpq_index(
    e: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    m: int = 8,
    k: int = 16,
    n_iters: int = 2,
) -> None:
    """Build-once half of the IVF-PQ lifecycle: train the coarse
    quantizer, train residual codebooks, encode, and persist the
    codes parquet PARTITIONED BY CELL (so serving inherits the IVF
    store's file-listing-time pruning) plus a parameter-sized meta
    with centroids + codebooks."""
    import json

    centroids = train_ivf_centroids(e, n_centroids, n_iters)
    assigned = _spread(
        e.select("vec_id", "label", "embedding")
    ).withColumn("cell", _nearest_cell(F.col("embedding"), centroids))
    assigned = assigned.localCheckpoint()  # one assignment feeds 3 passes
    codebooks = _train_residual_pq(assigned, centroids, m, k, n_iters)

    import numpy as np

    c_arr = np.array(centroids, dtype=np.float64)
    c_norm = np.sqrt((c_arr * c_arr).sum(axis=1))
    c_norm[c_norm == 0.0] = 1.0
    c_hat = (c_arr / c_norm[:, None]).tolist()

    def _enc(batches, cb=codebooks, chat=c_hat):
        import numpy as np
        import pandas as pd

        books = np.array(cb, dtype=np.float64)
        cmat = np.array(chat, dtype=np.float64)
        mm, _, sub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0.0] = 1.0
            res = mat / nrm[:, None] - cmat[pdf["cell"].to_numpy()]
            codes = np.empty((len(mat), mm), dtype=np.int32)
            for j in range(mm):
                sv = res[:, j * sub : (j + 1) * sub]
                d2 = (
                    (sv * sv).sum(axis=1)[:, None]
                    - 2.0 * sv @ books[j].T
                    + (books[j] * books[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "cell": pdf["cell"],
                    "codes": [list(map(int, c)) for c in codes],
                }
            )

    from datapoints_csv_extractor_spark.operators.dedup import (
        _commit_manifest,
    )

    (
        assigned.mapInPandas(
            _enc, "vec_id long, label int, cell int, codes array<int>"
        )
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "codes", "ingest=base"))
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "n_centroids": n_centroids,
                "m": m,
                "k": k,
                "centroids": centroids,
                "codebooks": codebooks,
            },
            f,
        )
    # Same manifest protocol as the IVF assignment store: the codes
    # directory is ingest-foldable (append_ivfpq_shard), tombstonable
    # (delete_from_store on vec_id), and compactable.
    _commit_manifest(index_dir, lambda ids: ["base"])


def _read_ivfpq_codes(spark: SparkSession, index_dir: str) -> DataFrame:
    """Committed, tombstone-filtered codes (``ingest`` dropped,
    ``cell`` kept as the pruning partition column) — the exact reader
    contract of ``read_ivf_assignments``, on the codes table."""
    from datapoints_csv_extractor_spark.operators.dedup import (
        _read_manifest,
        store_tombstones,
    )

    base = os.path.join(index_dir, "codes")
    ingests = _read_manifest(index_dir)
    if not ingests:
        out = spark.read.parquet(base)
    else:
        out = (
            spark.read.option("basePath", base)
            .parquet(*[os.path.join(base, f"ingest={i}") for i in ingests])
            .drop("ingest")
        )
    dead = store_tombstones(spark, index_dir, id_col="vec_id")
    if dead is not None:
        out = out.join(dead, "vec_id", "left_anti")
    return out


def append_ivfpq_shard(
    e_new: DataFrame, index_dir: str, ingest_id: str | None = None
) -> bool:
    """Incremental half of the IVF-PQ lifecycle: encode a NEW
    embedding shard against the FROZEN centroids + codebooks (one
    map-only Arrow pass — no retraining, no touching stored codes)
    and fold it in as a manifest-committed ingest. Replay of a
    committed ``ingest_id`` is a no-op (returns False) — the same
    at-least-once contract as every other store fold. Codebook drift
    from corpus growth is the offline refresh's business (rebuild via
    ``build_ivfpq_index``), mirroring ``refresh_ivf_index``."""
    import json
    import uuid

    import numpy as np

    from datapoints_csv_extractor_spark.operators.dedup import (
        _commit_manifest,
        _read_manifest,
    )

    spark = e_new.sparkSession
    ingest_id = ingest_id or uuid.uuid4().hex[:12]
    if ingest_id in _read_manifest(index_dir):
        return False
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    centroids, codebooks = meta["centroids"], meta["codebooks"]
    c_arr = np.array(centroids, dtype=np.float64)
    c_norm = np.sqrt((c_arr * c_arr).sum(axis=1))
    c_norm[c_norm == 0.0] = 1.0
    c_hat = (c_arr / c_norm[:, None]).tolist()

    assigned = _spread(
        e_new.select("vec_id", "label", "embedding")
    ).withColumn("cell", _nearest_cell(F.col("embedding"), centroids))

    def _enc(batches, cb=codebooks, chat=c_hat):
        import numpy as np
        import pandas as pd

        books = np.array(cb, dtype=np.float64)
        cmat = np.array(chat, dtype=np.float64)
        mm, _, sub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0.0] = 1.0
            res = mat / nrm[:, None] - cmat[pdf["cell"].to_numpy()]
            codes = np.empty((len(mat), mm), dtype=np.int32)
            for j in range(mm):
                sv = res[:, j * sub : (j + 1) * sub]
                d2 = (
                    (sv * sv).sum(axis=1)[:, None]
                    - 2.0 * sv @ books[j].T
                    + (books[j] * books[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "cell": pdf["cell"],
                    "codes": [list(map(int, c)) for c in codes],
                }
            )

    (
        assigned.mapInPandas(
            _enc, "vec_id long, label int, cell int, codes array<int>"
        )
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "codes", f"ingest={ingest_id}"))
    )
    _commit_manifest(
        index_dir, lambda ids: ids if ingest_id in ids else ids + [ingest_id]
    )
    return True


def ann_ivfpq_topk(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    source: DataFrame | None = None,
    rerank_factor: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Query-once half: probe the ``n_probe`` max-cosine cells
    (driver-side over the parameter-sized centroid table — the same
    rule as ``ann_ivf_topk_from_index``), build one ADC table PER
    PROBED CELL from the query's residual against that cell, and
    score ONLY those cells' codes — the scan is partition-pruned at
    file listing AND each row costs m element_at lookups, no float
    vector math. Optional exact re-rank against ``source``."""
    import json

    import numpy as np

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    centroids = meta["centroids"]
    codebooks = meta["codebooks"]
    n_k = meta["k"]
    probe_cells = [
        cid
        for cid, _ in sorted(
            ((cid, _cos_list(query_vec, c)) for cid, c in enumerate(centroids)),
            key=lambda t: -t[1],
        )[: n_probe]
    ]

    q = np.array(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum())) or 1.0
    q_hat = q / qn
    books = np.array(codebooks, dtype=np.float64)  # (m, k, sub)
    mm, _, sub = books.shape
    c_arr = np.array(centroids, dtype=np.float64)
    c_norm = np.sqrt((c_arr * c_arr).sum(axis=1))
    c_norm[c_norm == 0.0] = 1.0
    c_hat = c_arr / c_norm[:, None]

    # One flat (m*k) lookup table per cell slot; non-probed slots stay
    # empty (their rows are pruned before scoring ever runs).
    luts: list[list[float]] = [[] for _ in centroids]
    for cid in probe_cells:
        q_res = q_hat - c_hat[cid]
        lut = np.empty((mm, n_k), dtype=np.float64)
        for j in range(mm):
            diff = books[j] - q_res[j * sub : (j + 1) * sub][None, :]
            lut[j] = (diff * diff).sum(axis=1)
        luts[cid] = [float(x) for x in lut.reshape(-1)]
    luts_lit = F.array(
        *[F.array(*[F.lit(x) for x in lut]) for lut in luts]
    )
    lut_c = F.element_at(luts_lit, F.col("cell") + 1)
    dist = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, j: F.element_at(
                lut_c, (j * F.lit(n_k) + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    codes = _read_ivfpq_codes(spark, index_dir).where(
        F.col("cell").isin(probe_cells)
    )
    if exclude_vec_id is not None:
        codes = codes.where(F.col("vec_id") != exclude_vec_id)
    adc = (
        codes.select("vec_id", "label", F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(rerank_factor * k if source is not None else k)
    )
    if source is None:
        return adc
    cand = [r["vec_id"] for r in adc.collect()]
    qlit = _f64_lit(float(x) for x in query_vec)
    cos = F.round(cosine(F.col("embedding"), qlit), 4)
    return (
        source.where(F.col("vec_id").isin(cand))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_ivfpq_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Driver-facing IVF-PQ: build the composed index into a scratch
    dir, probe half the cells, ADC + exact re-rank the neighbors of
    vec 0 (rows-only: k-means training end to end; recall vs brute
    force is pinned in pytest)."""
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    qvec = [float(x) for x in qrow[0]]
    index_dir = tempfile.mkdtemp(prefix="spark_graft_ivfpq_")
    try:
        build_ivfpq_index(e, index_dir, n_centroids=8, m=8, k=16, n_iters=2)
        out = ann_ivfpq_topk(
            spark, index_dir, qvec, k=k, n_probe=4, source=e,
            exclude_vec_id=query_vec_id,
        )
        # Materialize before the scratch index dir disappears.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def q_ann_recall_report(
    spark: SparkSession, sf_dir: str, k: int = 10, n_queries: int = 5
) -> DataFrame:
    """Recall@k datacard for every ANN path against exact brute
    force, one row per method (hyperplane LSH, IVF, PQ, IVF-PQ, SQ8) — the
    measurement harness an embedding
    platform runs before trusting an index family: pick n_queries
    probe vectors, build each index once into scratch, and score
    |approx ∩ exact| / k averaged over the probes.

    Everything driver-side here is parameter-sized (n_queries probe
    ids and k-sized result lists); each method's per-query plan is
    the same one its serving path uses, so the recall measured IS the
    recall shipped. Rows-only (k-means/LSH training end to end).

    Reading the numbers: on the ISOTROPIC synthetic embeddings the
    exact neighbors of a probe are near-orthogonal strangers, so
    single-probe hyperplane LSH legitimately scores near-zero (its
    recall on PLANTED near-duplicates — the workload it exists for —
    is pinned separately in pytest), while the k-means families
    (IVF/PQ/IVF-PQ) stay high because their cells/codes partition
    even structureless space. That contrast is the point of the
    report: it tells you which index family your data's geometry can
    actually support."""
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    probes = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < n_queries).collect()
    ]

    def topk_ids(df: DataFrame) -> list[int]:
        return [int(r["vec_id"]) for r in df.collect()]

    exact: dict[int, set[int]] = {}
    for qid, qvec in probes:
        qlit = _f64_lit(qvec)
        exact[qid] = set(
            topk_ids(
                e.where(F.col("vec_id") != qid)
                .select(
                    "vec_id",
                    F.round(cosine(F.col("embedding"), qlit), 6).alias("c"),
                )
                .orderBy(F.desc("c"), F.asc("vec_id"))
                .limit(k)
            )
        )

    results: list[tuple[str, float]] = []

    def add(method: str, got_by_qid: dict[int, list[int]]) -> None:
        rec = sum(
            len(set(got_by_qid[qid]) & exact[qid]) / k for qid, _ in probes
        ) / len(probes)
        results.append((method, round(rec, 4)))

    add(
        "lsh_hyperplane",
        {
            qid: topk_ids(ann_lsh_topk_df(e, query_vec_id=qid, k=k))
            for qid, _ in probes
        },
    )

    scratch = tempfile.mkdtemp(prefix="spark_graft_recall_")
    try:
        ivf_dir = os.path.join(scratch, "ivf")
        build_ivf_index(e, ivf_dir, n_centroids=8, n_train_iters=2)
        add(
            "ivf",
            {
                qid: topk_ids(
                    ann_ivf_topk_from_index(
                        spark, ivf_dir, qvec, k=k, n_probe=2,
                        exclude_vec_id=qid,
                    )
                )
                for qid, qvec in probes
            },
        )

        pq_dir = os.path.join(scratch, "pq")
        build_pq_index(e, pq_dir, n_iters=2)
        add(
            "pq_adc_rerank",
            {
                qid: topk_ids(
                    ann_pq_topk_from_index(
                        spark, pq_dir, qvec, k=k, source=e,
                        exclude_vec_id=qid,
                    )
                )
                for qid, qvec in probes
            },
        )

        ivfpq_dir = os.path.join(scratch, "ivfpq")
        build_ivfpq_index(e, ivfpq_dir, n_centroids=8, m=8, k=16, n_iters=2)
        add(
            "ivfpq_rerank",
            {
                qid: topk_ids(
                    ann_ivfpq_topk(
                        spark, ivfpq_dir, qvec, k=k, n_probe=2, source=e,
                        exclude_vec_id=qid,
                    )
                )
                for qid, qvec in probes
            },
        )
        sq_dir = os.path.join(scratch, "sq")
        build_sq_index(e, sq_dir)
        add(
            "sq8",
            {
                qid: topk_ids(
                    ann_sq_topk_from_index(
                        spark, sq_dir, qvec, k=k, exclude_vec_id=qid
                    )
                )
                for qid, qvec in probes
            },
        )
        # JL projection tier: brute-force cosine in the 16-dim
        # projected space. Honest expectation on isotropic data:
        # LOW recall (weakly-separated neighbors do not survive a 4x
        # dimension cut) — the row exists so the datacard says so,
        # next to the distance-preservation contract pinned in
        # tests/test_random_projection.py.
        proj = rp_project(e).select("vec_id", F.col("rp").alias("embedding"))
        proj = proj.localCheckpoint()
        rp_got = {}
        for qid, _ in probes:
            qrow = proj.where(F.col("vec_id") == qid).first()
            qlit = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
            rp_got[qid] = topk_ids(
                proj.where(F.col("vec_id") != qid)
                .select(
                    "vec_id",
                    F.round(cosine(F.col("embedding"), qlit), 6).alias("c"),
                )
                .orderBy(F.desc("c"), F.asc("vec_id"))
                .limit(k)
            )
        add("rp16_brute", rp_got)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    return spark.createDataFrame(
        [(m, r, n_queries, k) for m, r in results],
        "method string, recall_at_k double, n_queries int, k int",
    ).orderBy("method")


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the fourth ANN compression tier
# ---------------------------------------------------------------------------

def train_sq_minmax(e: DataFrame, dim: int = 64) -> tuple[list, list]:
    """Per-dimension (min, max) for SQ8 scalar quantization — ONE scan
    with 2*dim aggregate expressions; the result is parameter-sized
    (2*dim doubles) like every quantizer's training output here.
    """
    emb = F.col("embedding")
    row = e.select(
        *[
            F.min(F.element_at(emb, i + 1).cast("double")).alias(f"mn{i}")
            for i in range(dim)
        ],
        *[
            F.max(F.element_at(emb, i + 1).cast("double")).alias(f"mx{i}")
            for i in range(dim)
        ],
    ).first()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def sq_encode_df(
    e: DataFrame, mins: list, maxs: list
) -> DataFrame:
    """SQ8 encode: per-dimension affine map to an 8-bit code,
    code_i = clamp(floor((x_i - min_i) / (max_i - min_i) * 255 + .5)).
    Map-only JVM transform; the (min, max) tables ride as folded array
    literals. Codes persist as array<int> whose 0..255 values parquet
    bit-packs to ~1 byte each — the 8x at-rest compression next to
    PQ's 64x, trading ratio for per-dimension fidelity (SQ preserves
    every axis; PQ quantizes subspaces jointly).

    Explicit floor(x + 0.5) rounding and guarded degenerate
    dimensions (max == min -> code 0) keep the codes engine-exact —
    this tier is the one ANN family whose whole serving path a SQL
    oracle can replay bit for bit.
    """
    # numpy-path literals (see _f64_lit): one true Literal each —
    # F.lit(list) built a CreateArray that the enc/dec transform
    # lambdas re-evaluated PER ELEMENT (the r11 lit-tax class).
    mins_lit = _f64_lit(mins)
    maxs_lit = _f64_lit(maxs)

    def enc(x: Column, i: Column) -> Column:
        mn = F.element_at(mins_lit, i + 1)
        mx = F.element_at(maxs_lit, i + 1)
        code = F.floor(
            (x.cast("double") - mn) / (mx - mn) * 255.0 + 0.5
        ).cast("int")
        return F.when(mx == mn, F.lit(0)).otherwise(
            F.least(F.greatest(code, F.lit(0)), F.lit(255))
        )

    return e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), enc).alias("codes"),
    )


def q_ann_sq_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """SQ8-served top-k: asymmetric distance (raw query vs decoded
    candidates — the standard SQ serving mode), cosine on the decoded
    vectors, rounded score with vec_id tie-break. The scan reads only
    codes-width data at scale; score arithmetic is the same JVM
    aggregate fold as exact kNN, so this entry is ORACLE-exact — the
    only ANN family whose end-to-end serving path the DuckDB twin
    replays exactly (LSH/IVF/PQ train with engine-specific hashing /
    k-means and are rows-only)."""
    e = load(spark, sf_dir, "embeddings")
    mins, maxs = train_sq_minmax(e)
    codes = sq_encode_df(e, mins, maxs)
    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    qlit = _f64_lit(float(x) for x in qrow[0])
    # numpy-path literals (see _f64_lit): one true Literal each —
    # F.lit(list) built a CreateArray that the enc/dec transform
    # lambdas re-evaluated PER ELEMENT (the r11 lit-tax class).
    mins_lit = _f64_lit(mins)
    maxs_lit = _f64_lit(maxs)

    def dec(c: Column, i: Column) -> Column:
        mn = F.element_at(mins_lit, i + 1)
        mx = F.element_at(maxs_lit, i + 1)
        return mn + c.cast("double") * (mx - mn) / 255.0

    decoded = F.transform(F.col("codes"), dec)
    score = F.round(cosine(decoded, qlit), 4)
    return (
        codes.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", score.alias("cosine_sq"))
        .orderBy(F.desc("cosine_sq"), F.asc("vec_id"))
        .limit(k)
    )


def build_sq_index(e: DataFrame, index_dir: str) -> tuple[list, list]:
    """Persist the SQ8 index: codes parquet + (min, max) params JSON —
    train once, serve forever, like every other quantizer store here.
    The codes table is the only data-sized artifact; params are 2*dim
    doubles. Returns (mins, maxs) for callers encoding new shards."""
    import json
    import os

    mins, maxs = train_sq_minmax(e)
    sq_encode_df(_spread(e), mins, maxs).write.mode("overwrite").parquet(
        os.path.join(index_dir, "codes")
    )
    tmp = os.path.join(index_dir, "params.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"mins": mins, "maxs": maxs}, fh)
    os.replace(tmp, os.path.join(index_dir, "params.json"))
    return mins, maxs


def ann_sq_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list,
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Serve top-k from a persisted SQ8 index: scan codes (the 1-byte-
    per-dim table), decode against the stored params, asymmetric
    cosine vs the raw query, TakeOrdered. Zero training in the plan."""
    import json
    import os

    with open(os.path.join(index_dir, "params.json")) as fh:
        params = json.load(fh)
    mins_lit = _f64_lit(params["mins"])
    maxs_lit = _f64_lit(params["maxs"])
    qlit = _f64_lit(float(x) for x in query_vec)
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    dead = _sq_tombstones(spark, index_dir)
    if dead is not None:
        codes = codes.join(F.broadcast(dead), "vec_id", "left_anti")
    if exclude_vec_id is not None:
        codes = codes.where(F.col("vec_id") != exclude_vec_id)

    def dec(c: Column, i: Column) -> Column:
        mn = F.element_at(mins_lit, i + 1)
        mx = F.element_at(maxs_lit, i + 1)
        return mn + c.cast("double") * (mx - mn) / 255.0

    score = F.round(cosine(F.transform(F.col("codes"), dec), qlit), 4)
    return (
        codes.select("vec_id", "label", score.alias("cosine_sq"))
        .orderBy(F.desc("cosine_sq"), F.asc("vec_id"))
        .limit(k)
    )


def delete_from_sq_index(
    spark: SparkSession, index_dir: str, vec_ids: list[int]
) -> None:
    """Tombstone vectors in the SQ8 store: append a deletes batch
    (O(batch), replay-append-safe — duplicate ids fold to one row at
    read time); the serving path anti-joins it until the next
    ``compact_sq_index`` folds the rows out physically. Completes the
    deletion story across all five ANN families."""
    import os

    spark.createDataFrame(
        [(int(v),) for v in vec_ids], "vec_id long"
    ).repartition(1).write.mode("append").parquet(
        os.path.join(index_dir, "deletes")
    )


def _sq_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    import os

    d = os.path.join(index_dir, "deletes")
    if not os.path.isdir(d) or not any(
        f.name.endswith(".parquet") for f in os.scandir(d)
    ):
        return None
    return spark.read.parquet(d).select("vec_id").distinct()


def compact_sq_index(spark: SparkSession, index_dir: str) -> int:
    """Fold tombstones out of the SQ8 codes physically (staging dir +
    atomic swap so readers never see a half-written store) and clear
    the deletes ledger. Returns rows removed."""
    import os
    import shutil

    dead = _sq_tombstones(spark, index_dir)
    if dead is None:
        return 0
    codes_dir = os.path.join(index_dir, "codes")
    codes = spark.read.parquet(codes_dir)
    before = codes.count()
    staged = os.path.join(index_dir, "codes.staging")
    codes.join(dead, "vec_id", "left_anti").write.mode("overwrite").parquet(
        staged
    )
    old = os.path.join(index_dir, "codes.old")
    os.rename(codes_dir, old)
    os.rename(staged, codes_dir)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "deletes"), ignore_errors=True)
    after = spark.read.parquet(codes_dir).count()
    return before - after


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: the DIMENSION axis of
# embedding compression, next to SQ8 (precision), PQ (codebook), and
# IVF (candidate pruning). Signs come from md5 over (seed, i, j) —
# public, engine-independent determinism — so the projection itself
# is expressible in ANSI SQL and the query is oracle-EXACT, unlike
# trained codebooks. Achlioptas (2003) shows +-1 entries satisfy the
# JL lemma with the same distortion bound as Gaussian matrices.
# ---------------------------------------------------------------------------


def rp_signs(
    d_in: int = 64, d_out: int = 16, seed: str = "rp-v1"
) -> list[list[float]]:
    """Deterministic +-1 projection matrix (d_in x d_out): sign(i, j)
    is the top bit of md5(f"{seed}:{i}:{j}"). Parameter-sized and
    recomputable anywhere — the matrix never ships, only the seed."""
    return [
        [
            1.0
            if int(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0], 16
            )
            < 8
            else -1.0
            for j in range(d_out)
        ]
        for i in range(d_in)
    ]


def _rp_dim_exprs(
    vec_col: str, d_in: int, d_out: int, seed: str
) -> list:
    """One unscaled projection Column per output dim: a zip_with
    multiply against a numpy-path array literal (one true Literal
    node, see _f64_lit) followed by a 0.0-seeded sequential F.aggregate
    sum. Two reasons for this shape over an explicit 64-term ADD
    chain: (1) Catalyst PLANNING over 16 x 64-term trees costs ~7 s
    per query (measured — execution was never the problem); the HOF
    form is ~15 nodes per dim. (2) zip_with/aggregate take the array
    as a DIRECT argument, so the form is capture-free-safe in any
    plan shape. The oracle twin writes the same 0.0-seeded
    left-assoc chain, so the fold order is bit-identical."""
    signs = rp_signs(d_in, d_out, seed)
    dims = []
    for j in range(d_out):
        col_j = _f64_lit(signs[i][j] for i in range(d_in))
        zipped = F.zip_with(
            F.col(vec_col), col_j, lambda x, s: x.cast("double") * s
        )
        dims.append(F.aggregate(zipped, F.lit(0.0), lambda a, t: a + t))
    return dims


def _rp_matrix_expr(vec_col: str, d_in: int, d_out: int, seed: str, finish):
    """All ``d_out`` projection dims as ONE array expression:
    transform over sequence(0, d_out-1), each element the same
    0.0-seeded zip_with/aggregate fold `_rp_dim_exprs` builds, against
    a row-slice of the FLATTENED sign matrix (one numpy-path literal
    for the whole matrix). Per-dim values and fold order are
    bit-identical to `_rp_dim_exprs`; the difference is build cost —
    the per-dim form issues ~2 py4j-heavy HOF constructions per output
    dim (measured ~0.6 s of pure driver time for 16 dims), this form
    issues 3 total. ``finish`` maps each dim's raw fold (scale/round)
    inside the lambda."""
    signs = rp_signs(d_in, d_out, seed)
    flat = _f64_lit(
        signs[i][j] for j in range(d_out) for i in range(d_in)
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(d_out - 1)),
        lambda j: finish(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.slice(flat, j * F.lit(d_in) + F.lit(1), F.lit(d_in)),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda a, t: a + t,
            )
        ),
    )


def rp_project(
    df: DataFrame,
    vec_col: str = "embedding",
    d_in: int = 64,
    d_out: int = 16,
    seed: str = "rp-v1",
) -> DataFrame:
    """Append ``rp``: the d_out-dim projection of ``vec_col`` scaled
    by 1/sqrt(d_out). Map-only, zero shuffle, zero Python; see
    _rp_dim_exprs for the planning-cost and capture-safety notes."""
    import math

    scale = float(repr(1.0 / math.sqrt(float(d_out))))
    return df.withColumn(
        "rp",
        _rp_matrix_expr(
            vec_col, d_in, d_out, seed, lambda d: d * F.lit(scale)
        ),
    )


def q_rp_project(
    spark: SparkSession,
    sf_dir: str,
    d_out: int = 16,
    seed: str = "rp-v1",
) -> DataFrame:
    """JL projection of every embedding to 16 dims in long form
    (vec_id, dim, value) — 4x memory reduction with JL-bounded
    distance distortion, oracle-exact because the +-1 matrix is
    md5-derived on both engines."""
    import math

    e = load(spark, sf_dir, "embeddings")
    # One matrix expression for all dims (see _rp_matrix_expr), then
    # posexplode: pos IS the dim index, so no per-dim struct building.
    scale = float(repr(1.0 / math.sqrt(float(d_out))))
    rp = _rp_matrix_expr(
        "embedding", 64, d_out, seed,
        lambda d: F.round(d * F.lit(scale), 6),
    )
    return (
        e.select("vec_id", F.posexplode(rp).alias("dim", "value"))
        .orderBy("vec_id", "dim")
    )


def rp_oracle_sql(
    d_in: int = 64, d_out: int = 16, seed: str = "rp-v1"
) -> str:
    """DuckDB twin of q_rp_project, generated from the SAME sign
    matrix with the same 0.0-seeded left-assoc fold order so the
    double chains are bit-identical to the Spark aggregate."""
    import math

    signs = rp_signs(d_in, d_out, seed)
    scale = repr(1.0 / math.sqrt(float(d_out)))
    branches = []
    for j in range(d_out):
        chain = " + ".join(
            ["0.0"]
            + [
                f"CAST(embedding[{i + 1}] AS DOUBLE) * {signs[i][j]!r}"
                for i in range(d_in)
            ]
        )
        branches.append(
            f"SELECT vec_id, CAST({j} AS INT) AS dim, "
            f"round(({chain}) * {scale}, 6) AS value FROM embeddings"
        )
    return (
        " UNION ALL ".join(branches) + " ORDER BY vec_id, dim"
    )


#: Row count per language side at which the bitext blocking key stops
#: being the raw ``label`` cell and starts conjoining hyperplane-LSH
#: bits. With the label cardinality FIXED, within-cell pair work is
#: sum(b_src*b_tgt) ~ n^2/cells — quadratic in corpus size. Each
#: extra bit halves the expected cell population, so choosing
#: bits = ceil(log2(n / threshold)) caps expected pairs at
#: ~n * threshold / (4 * n_labels): LINEAR in n by construction.
BITEXT_REBUCKET_THRESHOLD = 2048


def bitext_auto_bits(n_rows: int) -> int:
    """Extra hyperplane-LSH bits the bitext blocking key conjoins at a
    given embeddings-table row count — 0 below
    :data:`BITEXT_REBUCKET_THRESHOLD` (the oracle-checked regime: the
    executed plan there is byte-identical to the classic label
    equijoin), then one bit per corpus doubling so expected per-cell
    pair work stays constant and TOTAL pair work stays linear."""
    import math

    if n_rows <= BITEXT_REBUCKET_THRESHOLD:
        return 0
    return int(math.ceil(math.log2(n_rows / BITEXT_REBUCKET_THRESHOLD)))


def bitext_blocking_key(dim: int, extra_bits: int) -> "Column":  # noqa: F821
    """The bitext candidate-join blocking key over the embeddings
    schema — the SINGLE definition shared by :func:`q_bitext_mine`
    and the bench probe's pair telemetry, so the probe counts exactly
    the candidate join the query executes (round-10 verdict item 1:
    the re-bucketing previously existed only as a bench-side model).
    ``extra_bits == 0`` is the raw ``label`` cell; ``extra_bits > 0``
    conjoins that many deterministic hyperplane-LSH sign bits
    (:func:`lsh_bucket` over the same LCG planes every LSH family
    here uses), i.e. the coarse cell REFINES as the corpus grows —
    near-identical cross-lingual embeddings agree on sign bits, so
    recall degrades only near hyperplane boundaries while pair work
    returns to linear."""
    if extra_bits <= 0:
        return F.col("label").cast("string")
    return F.concat_ws(
        "|",
        F.col("label").cast("string"),
        lsh_bucket(F.col("embedding"), dim, extra_bits).cast("string"),
    )


def bitext_side_flags() -> tuple["Column", "Column"]:  # noqa: F821
    """The (src, tgt) side-split convention of :func:`q_bitext_mine`
    as boolean Column expressions over the embeddings schema — the
    SINGLE definition of which rows are "source language" vs "target
    language". Exported so the bench probe's pair telemetry counts
    exactly the pair set the query enumerates (round-9 advice: the
    probe previously duplicated the ``vec_id % 2`` convention inline,
    so a change to the operator's split would have silently decoupled
    the telemetry from the query)."""
    return (F.col("vec_id") % 2 == 0, F.col("vec_id") % 2 == 1)


def q_bitext_mine(
    spark: SparkSession,
    sf_dir: str,
    k: int = 4,
    threshold: float = 1.0,
    extra_bucket_bits: int | None = None,
) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
    the LASER/CCMatrix recipe): score every cross-lingual candidate
    pair by its cosine RATIO to the local neighborhood density —
    margin(x, y) = cos(x, y) / mean(avg top-k cos of x, avg top-k cos
    of y) — then keep pairs that are each other's best margin match
    (the "max" strategy's mutual form). Plain cosine thresholds
    over-mine hubs (vectors near everything); the margin denominator
    cancels hubness out.

    Stand-in bilingual setup over the embeddings table: even vec_ids
    are the source language, odd the target, and the ``label`` column
    is the coarse blocking cell (at 100 TB: the IVF cell / LSH bucket
    that caps the candidate space — pair work is sum(b_src*b_tgt) per
    cell, never |src| x |tgt|).

    ``extra_bucket_bits`` is the 100 TB scale dial (VERDICT r10 item
    1): the ``label`` cardinality is FIXED, so the within-cell
    candidate join grows quadratically with corpus size unless the
    cell itself refines. ``None`` (the default) resolves to
    :func:`bitext_auto_bits` of the table's row count — 0 in the
    oracle-checked regime (<= :data:`BITEXT_REBUCKET_THRESHOLD` rows,
    where the executed plan is exactly the classic label equijoin and
    the DuckDB twin is hash-exact), then one extra hyperplane-LSH bit
    per corpus doubling, capping expected pair work at O(n). The
    probe measures the EXECUTED join's pair count through the shared
    :func:`bitext_blocking_key` (bench_detail pair telemetry:
    100.21x pairs at 10x rows raw -> ~6x with the auto dial).

    Engine-exactness: the pair cosine is the JVM sequential fold
    rounded to 4 (the repo's established parity contract), then
    scaled to an INTEGER (x10000). Every downstream statistic —
    top-k sums, counts, and the margin itself — is integer-rational:
    margin = 2*cos_i*f_cnt*b_cnt / (f_sum*b_cnt + b_sum*f_cnt), one
    double division rounded to 4 on both engines. Ties in the mutual
    argmax break on the partner id, so the mined set is
    engine-independent.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    if extra_bucket_bits is None:
        # One metadata-cheap count resolves the scale dial; parquet
        # answers it from footer statistics without a data scan.
        extra_bucket_bits = bitext_auto_bits(e.count())
    dim = len(e.select("embedding").head()[0]) if extra_bucket_bits else 0
    block = bitext_blocking_key(dim, extra_bucket_bits)
    # Norms are hoisted to one fold per ROW (not per pair) — sqrt of
    # the same sequential sum the per-pair form would compute, so the
    # cosine doubles are unchanged; only 1 of 3 folds remains per pair.
    src_side, tgt_side = bitext_side_flags()
    src = e.where(src_side).select(
        F.col("vec_id").alias("src_id"),
        "label",
        block.alias("block"),
        F.col("embedding").alias("se"),
        _norm(F.col("embedding")).alias("sn"),
    )
    tgt = e.where(tgt_side).select(
        F.col("vec_id").alias("tgt_id"),
        block.alias("block"),
        F.col("embedding").alias("te"),
        _norm(F.col("embedding")).alias("tn"),
    )
    cos_i = F.round(
        F.round(
            _dot(F.col("se"), F.col("te")) / (F.col("sn") * F.col("tn")), 4
        )
        * 10000,
        0,
    ).cast("long")
    # The blocking key alone has only n_cells distinct values, so a
    # plain cell equijoin caps the per-pair fold at n_cells-way
    # parallelism (and AQE's skew splitter keys on BYTES, which tiny
    # embedding rows never trip). Fragment-replicate salting restores
    # fan-out: the src side fragments on src_id, the tgt side
    # replicates each row across the S fragments — S x tgt rows
    # buys (n_cells x S)-way parallel pair work, values unchanged.
    salt_n = 8
    s_src = src.withColumn("salt", F.pmod(F.col("src_id"), F.lit(salt_n)))
    s_tgt = tgt.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    pairs = (
        s_src.join(s_tgt, ["block", "salt"])
        .select("src_id", "tgt_id", "label", cos_i.alias("cos_i"))
        .where(F.col("cos_i").isNotNull())
    )
    w_f = Window.partitionBy("src_id").orderBy(
        F.desc("cos_i"), F.asc("tgt_id")
    )
    w_b = Window.partitionBy("tgt_id").orderBy(
        F.desc("cos_i"), F.asc("src_id")
    )
    ranked = pairs.select(
        "*",
        F.row_number().over(w_f).alias("rf"),
        F.row_number().over(w_b).alias("rb"),
    )
    fwd = (
        ranked.where(F.col("rf") <= k)
        .groupBy("src_id")
        .agg(
            F.sum("cos_i").alias("f_sum"),
            F.count("*").alias("f_cnt"),
        )
    )
    bwd = (
        ranked.where(F.col("rb") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum("cos_i").alias("b_sum"),
            F.count("*").alias("b_cnt"),
        )
    )
    den = F.col("f_sum") * F.col("b_cnt") + F.col("b_sum") * F.col("f_cnt")
    margin = F.round(
        (2 * F.col("cos_i") * F.col("f_cnt") * F.col("b_cnt")).cast("double")
        / den,
        4,
    )
    # fwd/bwd are |src|- and |tgt|-sized (one row per vector) — NOT
    # broadcastable at scale; both joins are key-partitioned shuffles
    # whose bigger side (pairs) is already cell-capped.
    scored = (
        pairs.join(fwd, "src_id")
        .join(bwd, "tgt_id")
        .where(den > 0)
        .select("src_id", "tgt_id", "label", "cos_i", margin.alias("margin"))
    )
    w_mf = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.asc("tgt_id")
    )
    w_mb = Window.partitionBy("tgt_id").orderBy(
        F.desc("margin"), F.asc("src_id")
    )
    return (
        scored.select(
            "*",
            F.row_number().over(w_mf).alias("mf"),
            F.row_number().over(w_mb).alias("mb"),
        )
        .where(
            (F.col("mf") == 1)
            & (F.col("mb") == 1)
            & (F.col("margin") >= threshold)
        )
        .select(
            "src_id",
            "tgt_id",
            "label",
            F.round(F.col("cos_i") / 10000.0, 4).alias("cosine"),
            "margin",
        )
        .orderBy("src_id")
    )


# --------------------------------------------------------------------
# Distributed PCA (tall-skinny): one Arrow pass folds each batch to a
# (count, sum-vector, gram-matrix) partial — d^2 + d + 1 doubles, so
# the driver reduction is parameter-sized no matter how many rows the
# corpus has — then numpy's eigh factors the d x d covariance on the
# driver and the k x d component matrix broadcasts back as literals.
# This is the canonical n-huge / d-small shape: the only full-data
# pass is map-side, shuffle-free, and linear.


def _pca_sufficient_stats(
    df: DataFrame, col: str
) -> tuple[int, "object", "object"]:
    """One Arrow pass folding the column to its PCA sufficient
    statistics (n, sum-vector, gram-matrix) — d^2 + d + 1 doubles,
    ADDITIVE across batches/shards (which is what makes the model
    incrementally updatable). Partials are summed in min-vec-id order
    so the driver-side float fold is order-stable across cluster
    re-partitionings."""
    import numpy as np
    import pandas as pd

    def _partials(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.array(pdf[col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "part_key": [int(pdf["__pk"].min())],
                    "n": [int(len(m))],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    src = df.select(F.monotonically_increasing_id().alias("__pk"), col)
    rows = sorted(
        src.mapInPandas(
            _partials,
            "part_key long, n long, s array<double>, g array<double>",
        ).collect(),
        key=lambda r: r.part_key,
    )
    if not rows:
        raise ValueError("pca: empty input")
    d = len(rows[0].s)
    n = sum(r.n for r in rows)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.array(r.s)
        g += np.array(r.g).reshape(d, d)
    return n, s, g


def _pca_factorize(n: int, s, g, k: int) -> dict:
    """Eigendecompose the covariance implied by (n, sum, gram) and
    package the model dict (components sign-canonicalized: largest-|.|
    entry positive — retrains and incremental folds stay byte-stable)."""
    import numpy as np

    if n < 2:
        raise ValueError("pca: need at least 2 rows")
    d = len(s)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = []
    for j in order:
        v = evecs[:, j]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
    return {
        "mean": mean.tolist(),
        "components": comps,
        "eigenvalues": [float(evals[j]) for j in order],
        "n": int(n),
        "d": int(d),
        "sum": [float(x) for x in s],
        "gram": [float(x) for x in g.ravel()],
    }


def pca_train(
    df: DataFrame, col: str = "embedding", k: int = 4
) -> dict:
    """Fit PCA over an array<float> column.

    Returns ``{"mean": [d], "components": [k][d], "eigenvalues": [k],
    "n": int, "d": int, "sum": [d], "gram": [d*d]}`` — the model
    CARRIES its sufficient statistics, so ``pca_update`` can fold new
    data in exactly (the stats are additive) without revisiting old
    rows. Components are L2-normalized, ordered by descending
    eigenvalue, and sign-canonicalized."""
    n, s, g = _pca_sufficient_stats(df, col)
    return _pca_factorize(n, s, g, k)


def pca_update(
    model: dict, df: DataFrame, col: str = "embedding", k: int | None = None
) -> dict:
    """Incremental refit: fold a new batch's sufficient statistics
    into the model's and re-eigendecompose — EXACTLY the model a full
    retrain on old+new would produce (the stats are additive; only
    the d x d eigensolve repeats, never the old data pass). The
    persisted-store analog of the band/IVF incremental folds."""
    import numpy as np

    n2, s2, g2 = _pca_sufficient_stats(df, col)
    d = model["d"]
    if len(s2) != d:
        raise ValueError(f"pca_update: dimension mismatch {len(s2)} != {d}")
    n = model["n"] + n2
    s = np.array(model["sum"]) + s2
    g = np.array(model["gram"]).reshape(d, d) + g2
    return _pca_factorize(n, s, g, k or len(model["components"]))


def pca_save(spark: SparkSession, model: dict, path: str) -> None:
    """Persist the model as a 1-row parquet frame (self-describing,
    readable by any engine — the repo's store idiom for
    parameter-sized artifacts)."""
    spark.createDataFrame(
        [
            (
                model["mean"],
                model["components"],
                model["eigenvalues"],
                model["n"],
                model["d"],
                model["sum"],
                model["gram"],
            )
        ],
        "mean array<double>, components array<array<double>>, "
        "eigenvalues array<double>, n long, d long, "
        "sum array<double>, gram array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def pca_load(spark: SparkSession, path: str) -> dict:
    row = _require_row(spark.read.parquet(path).first(), f"PCA model at {path}")
    return {
        "mean": list(row.mean),
        "components": [list(c) for c in row.components],
        "eigenvalues": list(row.eigenvalues),
        "n": row.n,
        "d": row.d,
        "sum": list(row.sum),
        "gram": list(row.gram),
    }


def pca_project(
    df: DataFrame, model: dict, col: str = "embedding", prefix: str = "pc"
) -> DataFrame:
    """Project rows onto the fitted components: pc_j = (x - mean) . c_j
    as JVM sequential folds over broadcast component LITERALS (k*d
    doubles inlined into the plan — no join, no shuffle, whole-stage
    codegen keeps the scan map-only)."""
    centered = F.zip_with(
        F.col(col),
        F.array(*[F.lit(float(m)) for m in model["mean"]]),
        lambda x, m: x.cast("double") - m,
    )
    out = df.withColumn("__c", centered)
    for j, comp in enumerate(model["components"], start=1):
        out = out.withColumn(
            f"{prefix}{j}",
            F.round(
                _dot(F.col("__c"), F.array(*[F.lit(float(c)) for c in comp])),
                6,
            ),
        )
    return out.drop("__c")


def pca_whiten_project(
    df: DataFrame,
    model: dict,
    col: str = "embedding",
    prefix: str = "wc",
    eps: float = 1e-9,
) -> DataFrame:
    """PCA WHITENING projection — pc_j / sqrt(eigenvalue_j), so every
    output coordinate has unit variance over the training
    distribution. Retrieval stacks whiten before cosine/inner-product
    search because a few high-variance directions otherwise dominate
    every similarity (the standard fix for anisotropic embedding
    spaces); it is also the ZCA precursor. Same plan shape as
    pca_project: the scale factors fold into the component LITERALS
    driver-side, so the scan stays map-only, no join, codegen'd.
    ``eps`` guards zero-variance directions (degenerate training
    data) rather than emitting inf."""
    import math

    scaled = dict(model)
    scaled["components"] = [
        [c / math.sqrt(max(ev, eps)) for c in comp]
        for comp, ev in zip(model["components"], model["eigenvalues"])
    ]
    return pca_project(df, scaled, col=col, prefix=prefix)


def q_pca_project(spark: SparkSession, sf_dir: str, k: int = 4) -> DataFrame:
    """Train-once PCA on the embeddings table, then project every
    vector onto the top-k components (vec_id, label, pc1..pck).

    Rows-only for the driver (eigendecomposition is not expressible in
    ANSI SQL); exactness vs a full numpy PCA replay — subspace match,
    per-component variance = eigenvalue, orthonormality, sign
    canonicalization, save/load round-trip — is pinned in pytest."""
    e = load(spark, sf_dir, "embeddings")
    model = pca_train(e, "embedding", k)
    return pca_project(
        e.select("vec_id", "label", "embedding"), model
    ).drop("embedding").orderBy("vec_id")


def q_mmr_rerank(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    pool: int = 25,
    k: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998): greedily pick k results that balance query relevance
    against redundancy with what's already picked —
    score(d) = lambda*cos(q,d) - (1-lambda)*max_{s in S} cos(d,s),
    lambda = 0.7. Plain top-k returns near-duplicate hits; MMR is the
    standard diversification pass over a bounded rerank window.

    Plan shape: candidate generation is the distributed part (one
    map-only scan + TakeOrdered for the top-``pool``); the greedy
    rerank is O(pool^2) PARAMETER-sized work — ``pool`` is the serving
    dial, exactly like an ANN re-score window. Pool pair cosines are
    computed by the JVM sequential fold (25 x 24 pairs), collected,
    and the greedy loop runs on INTEGERS only: cosines are scaled to
    x10000 BIGINT and lambda to tenths (score_i = 7*cos_i -
    3*max_sim_i), so the selection order is a total integer order
    (ties -> smaller vec_id) that DuckDB's recursive-CTE twin
    reproduces exactly; the only doubles are the final display
    divisions, rounded by SPARK so both engines share round()
    semantics."""
    e = load(spark, sf_dir, "embeddings")
    qrow = _require_row(
        e.where(F.col("vec_id") == query_vec_id).select("embedding").first(),
        f"query vec_id={query_vec_id}",
    )
    qlit = _f64_lit(float(x) for x in qrow[0])
    cos_i = F.round(
        F.round(cosine(F.col("embedding"), qlit), 4) * 10000, 0
    ).cast("long")
    cand = (
        e.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", "embedding", cos_i.alias("cos_i"))
        .orderBy(F.desc("cos_i"), F.asc("vec_id"))
        .limit(pool)
    ).cache()
    a = cand.select(
        F.col("vec_id").alias("ai"), F.col("embedding").alias("ea")
    )
    b = cand.select(
        F.col("vec_id").alias("bi"), F.col("embedding").alias("eb")
    )
    sim_i = F.round(
        F.round(cosine(F.col("ea"), F.col("eb")), 4) * 10000, 0
    ).cast("long")
    pair_rows = (
        a.join(b, F.col("ai") != F.col("bi"))
        .select("ai", "bi", sim_i.alias("sim_i"))
        .collect()
    )
    sim = {(r.ai, r.bi): r.sim_i for r in pair_rows}
    cands = {
        r.vec_id: (r.label, r.cos_i)
        for r in cand.select("vec_id", "label", "cos_i").collect()
    }
    cand.unpersist()

    picked: list[tuple[int, int, int, int, int]] = []  # rank,vid,label,cos_i,score_i
    selected: list[int] = []
    for step in range(1, min(k, len(cands)) + 1):
        best = None
        for vid, (lab, ci) in cands.items():
            if vid in selected:
                continue
            if selected:
                score = 7 * ci - 3 * max(sim[(vid, s)] for s in selected)
            else:
                score = 7 * ci
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, lab, ci, score)
        _, vid, lab, ci, score = best
        selected.append(vid)
        picked.append((step, vid, lab, ci, score))

    out = spark.createDataFrame(
        picked, "rank int, vec_id long, label int, cos_i long, score_i long"
    )
    return out.select(
        "rank",
        "vec_id",
        "label",
        F.round(F.col("cos_i") / 10000.0, 4).alias("cosine"),
        F.round(F.col("score_i") / 70000.0, 4).alias("mmr_score"),
    ).orderBy("rank")


def q_hard_negative_mine(
    spark: SparkSession,
    sf_dir: str,
    eval_mod: int = 20,
    max_query_id: int = 2_000,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/triplet training: for each
    anchor in a bounded query set, the top-k most-similar vectors of a
    DIFFERENT label (the negatives that actually teach the model),
    each flagged when it violates the triplet margin — i.e. scores at
    or above the anchor's best same-label positive. Random negatives
    are mostly easy; mining the confusable ones is the standard
    curriculum step for embedding-model training data.

    Same plan contract as q_semantic_decontamination: the anchor side
    is bounded (``vec_id % eval_mod == 0 AND vec_id < max_query_id``
    — a fixed probe set) and broadcast, so the corpus is scanned ONCE
    with no shuffle before the per-anchor top-k window; per-row norms
    are hoisted out of the pair fold. Scoring is the JVM sequential
    fold rounded to 4 — engine-exact vs the oracle; ties break on
    vec_id."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    with_norm = e.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = with_norm.where(
        (F.col("vec_id") % eval_mod == 0) & (F.col("vec_id") < max_query_id)
    ).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("qe")) / (F.col("nrm") * F.col("qn")),
        4,
    )
    # Two consumers below (pos + negs) — without materialization the
    # n x |anchors| broadcast fold would compute TWICE (round-8 probe
    # measured a 17.75x work ratio at 10x data from exactly this).
    # localCheckpoint once; both branches then read the cached rows
    # (the q_dtw_knn multi-consumer template).
    scored = (
        with_norm.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_vec_id")
        )
        .select(
            "query_vec_id", "query_label", "vec_id", "label",
            cos.alias("cosine"),
        )
        .localCheckpoint()
    )
    pos = (
        scored.where(F.col("label") == F.col("query_label"))
        .groupBy("query_vec_id")
        .agg(F.max("cosine").alias("pos_cosine"))
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    negs = (
        scored.where(F.col("label") != F.col("query_label"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    # pos is one row per anchor — parameter-sized, broadcastable.
    return (
        negs.join(F.broadcast(pos), "query_vec_id")
        .select(
            "query_vec_id",
            "query_label",
            "rank",
            "vec_id",
            "label",
            "cosine",
            "pos_cosine",
            (F.col("cosine") >= F.col("pos_cosine")).alias("violation"),
        )
        .orderBy("query_vec_id", "rank")
    )


def q_coreset_kcenter(
    spark: SparkSession, sf_dir: str, k: int = 16
) -> DataFrame:
    """Coreset selection by farthest-point sampling (greedy k-center,
    Gonzalez 1985): seed with the smallest vec_id, then repeatedly add
    the point MAXIMIZING its distance to the nearest already-chosen
    center — the classic 2-approximation for k-center coverage, used
    for training-data pruning and active-learning batch selection
    (pick the k docs that best cover embedding space, not k random
    ones).

    Distributed shape: the corpus is never paired with itself — each
    round scores ONE new center (a broadcast literal) against the
    corpus and folds it into a materialized running min-distance
    column (cache-swap per round, k rounds of map-only work + a
    1-row argmax action; O(k * n) distance folds total, the standard
    iterative-driver pattern used by Lloyd/PageRank here).

    Engine-exact: squared-L2 distances are the JVM sequential fold
    rounded to 4 then scaled to x10000 BIGINT, so the running min and
    the argmax (ties -> smaller vec_id) are integer decisions the
    recursive-CTE oracle twin reproduces exactly. The seed row
    reports NULL distance (nothing to be far from yet)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    seed = _require_row(
        e.orderBy(F.asc("vec_id")).first(), "non-empty embeddings"
    )

    def dist_to(center: list[float]) -> Column:
        clit = F.array(*[F.lit(float(x)) for x in center])
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                clit,
                lambda x, c: (x.cast("double") - c)
                * (x.cast("double") - c),
            ),
            F.lit(0).cast("double"),
            lambda acc, x: acc + x,
        )
        return F.round(F.round(d2, 4) * 10000, 0).cast("long")

    picked = [(1, seed.vec_id, seed.label, None)]
    chosen_ids = {seed.vec_id}
    # ONE action per round: the argmax TakeOrdered evaluates every
    # partition of `cur`, so it both reads the answer AND fills the
    # round's cache as a side effect — the separate count() that used
    # to pre-materialize each cache doubled the job count of the loop
    # (2k -> k actions; fresh-JVM best-of-3 at sf0.1 measured 6.7 ->
    # 4.7 s wall, 85 -> 21 stages, identical picks). The predecessor
    # frame is unpersisted only AFTER the
    # argmax has materialized its successor, so no round ever
    # recomputes its parent's distance fold from lineage.
    cur = e.withColumn("mind", dist_to(list(seed.embedding))).cache()
    prev = None
    for step in range(2, k + 1):
        far = _require_row(
            cur.where(~F.col("vec_id").isin(*chosen_ids))
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .first(),
            "corpus larger than k",
        )
        if prev is not None:
            prev.unpersist()
        picked.append((step, far.vec_id, far.label, far.mind))
        chosen_ids.add(far.vec_id)
        nxt = cur.withColumn(
            "mind", F.least(F.col("mind"), dist_to(list(far.embedding)))
        ).cache()
        prev, cur = cur, nxt
    if prev is not None:
        prev.unpersist()
    cur.unpersist()
    out = spark.createDataFrame(
        picked, "rank int, vec_id long, label int, mind long"
    )
    return out.select(
        "rank",
        "vec_id",
        "label",
        F.round(F.col("mind") / 10000.0, 4).alias("maximin_dist"),
    ).orderBy("rank")


def mmd_quadruple_stats(
    x: DataFrame, y: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """The linear-MMD h-statistic's SUFFICIENT STATISTICS for two
    embedding samples: one row (n_quadruples, h_sum, h2_sum) —
    additive across shards/micro-batches, which is what makes the
    streaming drift monitor an exact fold of batch recomputes.

    Quadruples pair consecutive id-rank rows on each side; when the
    reference side ``x`` is smaller its quadruples CYCLE (reference
    reuse — standard for a fixed monitoring reference; the CLT
    z-score is then approximate, noted at the caller). Kernel is the
    polynomial (1 + <a,b>/d)^2 over the ROUNDED JVM-fold dot; h
    rounds to 6 and sums as DECIMAL(28,6) (order-independent,
    engine-exact)."""
    from pyspark.sql import Window

    def slots(df: DataFrame, pref: str) -> DataFrame:
        w = Window.orderBy(id_col)
        rn = F.row_number().over(w)
        d = df.select(
            rn.alias("rn"), F.col("embedding").alias(f"{pref}_emb")
        )
        q = ((F.col("rn") + 1) / 2).cast("long")
        return d.groupBy(q.alias("quad")).agg(
            F.max(F.when(F.col("rn") % 2 == 1, F.col(f"{pref}_emb"))).alias(
                f"{pref}1"
            ),
            F.max(F.when(F.col("rn") % 2 == 0, F.col(f"{pref}_emb"))).alias(
                f"{pref}2"
            ),
        ).where(
            F.col(f"{pref}1").isNotNull() & F.col(f"{pref}2").isNotNull()
        )

    xs = slots(x, "x")
    ys = slots(y, "y")
    n_x = xs.count()
    if n_x == 0:
        raise ValueError("mmd_quadruple_stats: reference side empty")
    ys = ys.withColumn("quad", (F.col("quad") - 1) % n_x + 1)
    quads = ys.join(xs, "quad")

    def kern(a: str, b: str):
        r = F.round(_dot(F.col(a), F.col(b)), 4)
        base = F.lit(1.0) + r / F.size(F.col("x1")).cast("double")
        return base * base

    h = F.round(
        kern("x1", "x2") + kern("y1", "y2") - kern("x1", "y2")
        - kern("x2", "y1"),
        6,
    )
    return quads.select(h.alias("h")).agg(
        F.count("*").alias("n_quadruples"),
        F.sum(F.col("h").cast("decimal(28,6)")).alias("h_sum"),
        F.sum((F.col("h") * F.col("h")).cast("decimal(28,6)")).alias(
            "h2_sum"
        ),
    )


def mmd_drift_report(stats: DataFrame) -> DataFrame:
    """(n, h_sum, h2_sum) -> the drift verdict row: mean h (the MMD^2
    estimate), its CLT z-score, drifted at 1% one-sided."""
    n = F.col("n_quadruples").cast("double")
    mean = F.col("h_sum").cast("double") / n
    var = (F.col("h2_sum").cast("double") / n) - mean * mean
    z = mean / F.sqrt(var / n)
    return stats.select(
        "n_quadruples",
        F.round(mean, 6).alias("mmd2"),
        F.round(z, 4).alias("z_score"),
        (F.round(z, 4) > 2.3263).alias("drifted"),
    )


def q_embedding_drift_mmd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-distribution drift test: the LINEAR-TIME MMD^2
    estimator (Gretton et al. 2012, the paired h-statistic) between a
    reference sample (even vec_ids) and a current sample (odd
    vec_ids) — the vector-space analog of the scalar PSI/KS drift
    reports: a retrained embedder or upstream corpus shift moves the
    whole distribution even when every per-coordinate histogram
    looks stable.

    The quadratic MMD is a pair-space statistic; the linear estimator
    pairs CONSECUTIVE samples (by vec_id rank) and averages
    h(i) = k(x1,x2) + k(y1,y2) - k(x1,y2) - k(x2,y1) over disjoint
    quadruples — ONE pass, no pair space, unbiased, with a CLT
    z-score from the same h sample. Kernel: polynomial
    (1 + <a,b>/d)^2 over the ROUNDED JVM-fold dot (exp-based RBF
    would hinge on libm parity across engines; the polynomial is
    rational in the rounded dots, so both engines compute identical
    doubles). Per-quadruple h rounds to 6 and sums as DECIMAL(28,6)
    — order-independent, engine-exact (the q_unigram_logprob
    discipline).

    Output: one row (n_quadruples, mmd2, z_score, drifted at 1%
    one-sided). Same-distribution halves of the testdata should NOT
    flag."""
    e = load(spark, sf_dir, "embeddings")
    x = e.where(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    y = e.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    return mmd_drift_report(mmd_quadruple_stats(x, y))


# --------------------------------------------------------------------------
# Late-interaction (ColBERT-style MaxSim) retrieval
# --------------------------------------------------------------------------

def q_colbert_maxsim(
    spark: SparkSession,
    sf_dir: str,
    tokens_per_doc: int = 16,
    n_queries: int = 5,
    top_k: int = 5,
) -> DataFrame:
    """Late-interaction retrieval (Khattab & Zaharia 2020, ColBERT):
    documents and queries are SETS of token vectors, and the score is
    MaxSim — for each query token take its best match among the
    document's tokens, then sum over query tokens. The per-token max
    is what single-vector cosine cannot express (one off-topic
    passage token doesn't drag the score down), and it is exactly a
    groupBy-max + groupBy-sum over an equijoin-shaped scan.

    Data shape: consecutive ``tokens_per_doc`` embeddings form one
    passage (vec_id div tokens_per_doc); the first ``n_queries``
    passages are the query set — the bounded broadcast probe contract
    (knn_multi / decontamination shape), so the scan is ONE pass over
    corpus token vectors with no corpus-side shuffle before the
    per-(query, qtoken, doc) max. Engine-exact by the integer-scale
    trick: cosines round to x10000 BIGINT, MaxSim is an integer
    max-then-sum, and the one double division per output row is the
    display rescale."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.floor(F.col("vec_id") / tokens_per_doc).cast("long").alias("doc"),
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
    )
    queries = e.where(F.col("doc") < n_queries).select(
        F.col("doc").alias("qid"),
        F.col("vec_id").alias("qtok"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    corpus = e.where(F.col("doc") >= n_queries)
    cos_i = F.round(
        F.round(
            _dot(F.col("embedding"), F.col("qe"))
            / (F.col("nrm") * F.col("qn")),
            4,
        )
        * 10000
    ).cast("long")
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "qid", "qtok", "doc", cos_i.alias("c")
    )
    maxsim = (
        scored.groupBy("qid", "qtok", "doc")
        .agg(F.max("c").alias("m"))
        .groupBy("qid", "doc")
        .agg(F.sum("m").alias("score_i"), F.count(F.lit(1)).alias("nq"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("score_i"), F.col("doc")
    )
    return (
        maxsim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "qid",
            "rank",
            "doc",
            F.round(
                F.col("score_i").cast("double") / 10000.0 / F.col("nq"), 4
            ).alias("maxsim"),
        )
        .orderBy("qid", "rank")
    )


def colbert_maxsim_oracle_sql(
    tokens_per_doc: int = 16, n_queries: int = 5, top_k: int = 5
) -> str:
    """DuckDB twin of q_colbert_maxsim: identical passage grouping,
    rounded-integer cosines, max-then-sum, and rank tie-break."""
    return f"""
        WITH e AS (
            SELECT vec_id,
                   CAST(floor(vec_id / {tokens_per_doc}) AS BIGINT) AS doc,
                   embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
        ), queries AS (
            SELECT doc AS qid, vec_id AS qtok, embedding AS qe,
                   nrm AS qn
            FROM e WHERE doc < {n_queries}
        ), scored AS (
            SELECT q.qid, q.qtok, c.doc,
                   CAST(round(round(
                       list_sum(list_transform(list_zip(c.embedding, q.qe),
                           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                       / (c.nrm * q.qn), 4) * 10000, 0) AS BIGINT) AS c
            FROM e c CROSS JOIN queries q
            WHERE c.doc >= {n_queries}
        ), maxsim AS (
            SELECT qid, doc, sum(m) AS score_i, count(*) AS nq
            FROM (
                SELECT qid, qtok, doc, max(c) AS m
                FROM scored GROUP BY 1, 2, 3
            ) GROUP BY 1, 2
        ), ranked AS (
            SELECT qid, doc, score_i, nq,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY score_i DESC, doc) AS rank
            FROM maxsim
        )
        SELECT qid, rank, doc,
               round(CAST(score_i AS DOUBLE) / 10000.0 / nq, 4) AS maxsim
        FROM ranked WHERE rank <= {top_k}
        ORDER BY qid, rank
    """
