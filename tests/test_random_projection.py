"""JL random-projection tests: numpy parity for the generated double
chains, and the distance-preservation property the JL lemma promises.

Top-k recall is deliberately NOT pinned: the synthetic embeddings are
near-isotropic, so nearest neighbors are weakly separated and no
16-dim sketch ranks them faithfully — the honest contract of a 4x JL
sketch is pairwise-DISTANCE preservation (dedup thresholds,
clustering radii), which is what these tests measure.
"""

from __future__ import annotations

import numpy as np
import pytest

from datapoints_csv_extractor_spark.operators import similarity as V

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    return (
        [r.vec_id for r in rows],
        np.array([r.embedding for r in rows], dtype=np.float64),
    )


def test_rp_project_matches_numpy(spark):
    ids, X = _vectors(spark)
    S = np.array(V.rp_signs(64, 16))
    expect = (X @ S) / np.sqrt(16.0)
    got = {
        r.vec_id: r.rp
        for r in V.rp_project(
            spark.read.parquet(f"{SF}/embeddings.parquet")
        ).collect()
    }
    for n, vid in enumerate(ids):
        assert np.allclose(got[vid], expect[n], rtol=1e-12, atol=1e-12)


def test_rp_signs_are_balanced_and_seed_sensitive():
    S = np.array(V.rp_signs(64, 16))
    assert set(np.unique(S)) == {-1.0, 1.0}
    # md5 bits: close to half positive.
    assert 0.4 < (S > 0).mean() < 0.6
    assert V.rp_signs(64, 16, seed="other") != V.rp_signs(64, 16)


def test_rp_preserves_pairwise_distances(spark):
    _ids, X = _vectors(spark)
    S = np.array(V.rp_signs(64, 16))
    P = (X @ S) / np.sqrt(16.0)
    d_full = np.linalg.norm(X[:80, None, :] - X[None, :80, :], axis=2)
    d_proj = np.linalg.norm(P[:80, None, :] - P[None, :80, :], axis=2)
    mask = d_full > 0
    ratio = d_proj[mask] / d_full[mask]
    # JL contract at 4x compression: unit-mean squared distortion,
    # individual pairs inside a wide but bounded band (deterministic
    # given the fixed seed + fixed testdata).
    assert ratio.mean() == pytest.approx(1.0, abs=0.1)
    assert (ratio**2).mean() == pytest.approx(1.0, abs=0.15)
    assert ratio.min() > 0.25
    assert ratio.max() < 1.75
