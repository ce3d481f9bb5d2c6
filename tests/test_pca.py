"""Distributed PCA: numpy-replay parity, spectral invariants, sign
canonicalization, save/load round-trip, and the serving projection.

The trainer folds each Arrow batch to (count, sum, gram) partials —
the tall-skinny shape — so the full numpy PCA over the collected
rows is the exact ground truth the distributed pass must reproduce.
"""

from __future__ import annotations

import numpy as np
import pytest

from datapoints_csv_extractor_spark.operators import similarity as V

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fitted(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = V.pca_train(e, "embedding", k=4)
    x = np.array(
        [r.embedding for r in e.select("embedding").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    return model, x


def test_pca_matches_numpy_eigh(fitted):
    model, x = fitted
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-9)
    assert np.allclose(
        model["eigenvalues"], [evals[j] for j in order], rtol=1e-8
    )
    for got, j in zip(model["components"], order):
        ref = evecs[:, j]
        # Same 1-D eigenspace: |cosine| == 1 (sign is canonicalized
        # separately; random testdata has distinct eigenvalues).
        assert abs(abs(np.dot(got, ref)) - 1.0) < 1e-8


def test_pca_components_orthonormal_and_sign_canonical(fitted):
    model, _ = fitted
    c = np.array(model["components"])
    assert np.allclose(c @ c.T, np.eye(len(c)), atol=1e-9)
    for v in c:
        assert v[int(np.argmax(np.abs(v)))] > 0
    ev = model["eigenvalues"]
    assert all(a >= b for a, b in zip(ev, ev[1:]))


def test_pca_projection_variance_equals_eigenvalue(fitted, spark):
    model, x = fitted
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    proj = (
        V.pca_project(e.select("vec_id", "embedding"), model)
        .orderBy("vec_id")
        .collect()
    )
    centered = x - np.array(model["mean"])
    for j, comp in enumerate(model["components"], start=1):
        got = np.array([r[f"pc{j}"] for r in proj])
        ref = centered @ np.array(comp)
        assert np.allclose(got, ref, atol=1e-6)  # round(6) serving
        assert np.isclose(
            ref.var(ddof=1), model["eigenvalues"][j - 1], rtol=1e-8
        )


def test_pca_train_is_deterministic_across_partitionings(spark, fitted):
    model, _ = fitted
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    again = V.pca_train(e.repartition(7), "embedding", k=4)
    assert np.allclose(model["mean"], again["mean"], atol=1e-12)
    for a, b in zip(model["components"], again["components"]):
        assert np.allclose(a, b, atol=1e-9)


def test_pca_save_load_round_trip(spark, fitted, tmp_path):
    model, _ = fitted
    path = str(tmp_path / "pca_model")
    V.pca_save(spark, model, path)
    back = V.pca_load(spark, path)
    assert back["n"] == model["n"] and back["d"] == model["d"]
    assert np.allclose(back["mean"], model["mean"])
    assert np.allclose(back["components"], model["components"])
    assert np.allclose(back["eigenvalues"], model["eigenvalues"])


def test_q_pca_project_shape(spark):
    df = V.q_pca_project(spark, SF)
    assert df.columns == ["vec_id", "label", "pc1", "pc2", "pc3", "pc4"]
    assert df.count() == 500


def test_pca_train_raises_on_empty_and_singleton(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError):
        V.pca_train(e.where("vec_id < 0"), "embedding")
    with pytest.raises(ValueError):
        V.pca_train(e.limit(1), "embedding")


def test_pca_update_equals_full_retrain(spark):
    """Folding the second half of the corpus into a model trained on
    the first half reproduces the full-corpus model (sufficient
    statistics are additive; only float-assoc noise differs)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    first = e.where("vec_id < 250")
    second = e.where("vec_id >= 250")
    full = V.pca_train(e, "embedding", k=4)
    inc = V.pca_update(V.pca_train(first, "embedding", k=4), second)
    assert inc["n"] == full["n"]
    assert np.allclose(inc["mean"], full["mean"], atol=1e-9)
    assert np.allclose(inc["eigenvalues"], full["eigenvalues"], rtol=1e-7)
    for a, b in zip(inc["components"], full["components"]):
        assert np.allclose(a, b, atol=1e-7)


def test_pca_update_rejects_dimension_mismatch(spark):
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = V.pca_train(e.where("vec_id < 100"), "embedding", k=2)
    truncated = e.where("vec_id >= 100").select(
        F.slice("embedding", 1, 8).alias("embedding")
    )
    with pytest.raises(ValueError):
        V.pca_update(model, truncated)


def test_pca_save_load_round_trips_sufficient_stats(spark, fitted, tmp_path):
    model, _ = fitted
    path = str(tmp_path / "pca_inc")
    V.pca_save(spark, model, path)
    back = V.pca_load(spark, path)
    assert np.allclose(back["sum"], model["sum"])
    assert np.allclose(back["gram"], model["gram"])
    # A loaded model keeps updating exactly.
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    upd = V.pca_update(back, e.where("vec_id < 50"))
    assert upd["n"] == model["n"] + 50


def test_whitened_projection_has_unit_variance(spark):
    # Whitened coordinates must have variance ~1 along every kept
    # component over the training rows, and equal pc_j / sqrt(ev_j).
    import numpy as np

    from datapoints_csv_extractor_spark.operators.similarity import (
        pca_project,
        pca_train,
        pca_whiten_project,
    )

    rng_rows = []
    for i in range(300):
        # anisotropic: dim0 stretched 10x
        base = [
            ((i * 37 + d * 11) % 101 - 50) / 50.0 for d in range(6)
        ]
        base[0] *= 10
        rng_rows.append((i, base))
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")
    model = pca_train(df, "embedding", 3)
    w = pca_whiten_project(df, model).select("vec_id", "wc1", "wc2", "wc3")
    arr = np.array(
        [[r.wc1, r.wc2, r.wc3] for r in w.orderBy("vec_id").collect()]
    )
    var = arr.var(axis=0)
    assert np.all(np.abs(var - 1.0) < 0.05), var
    p = pca_project(df, model).select("vec_id", "pc1").orderBy("vec_id")
    pc1 = np.array([r.pc1 for r in p.collect()])
    ratio = pc1 / arr[:, 0]
    ev0 = model["eigenvalues"][0]
    assert np.allclose(ratio, np.sqrt(ev0), rtol=1e-3)
