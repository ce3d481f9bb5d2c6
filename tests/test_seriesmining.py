"""Series-mining family: DTW kernel parity, LB_Keogh soundness,
SAX determinism, and end-to-end funnel quality vs brute force.

The SAX words/motifs are oracle-checked (scripts/check_oracle.py);
here we pin the non-SQL parts: the banded-DTW dynamic program against
an independent full-matrix reference, the lower-bound property that
makes the pruning funnel sound, and the blocked pipeline's recall on
real sf0.001 data against all-pairs brute force.
"""

from __future__ import annotations

import numpy as np
import pytest

from datapoints_csv_extractor_spark.operators.seriesmining import (
    _dtw_band,
    _lb_keogh,
    _znorm,
    dtw_nearest_neighbor,
    q_dtw_knn,
    q_sax_words,
    sax_letters,
    user_series,
)

SF = "/root/testdata/sf0.001"


def dtw_reference(x, y, r):
    """Independent full-matrix banded DTW (no rolling-array trick)."""
    n = len(x)
    D = np.full((n + 1, n + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            if abs(i - j) > r:
                continue
            c = (x[i - 1] - y[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(np.sqrt(D[n, n]))


@pytest.mark.parametrize("r", [1, 3, 29])
def test_dtw_kernel_matches_full_matrix_reference(r):
    rng = np.random.default_rng(7)
    for _ in range(25):
        x = rng.integers(0, 10, size=30).astype(float)
        y = rng.integers(0, 10, size=30).astype(float)
        assert _dtw_band(x, y, r) == pytest.approx(
            dtw_reference(x, y, r), abs=1e-12
        )


def test_dtw_identity_and_symmetry():
    rng = np.random.default_rng(11)
    x = rng.normal(size=30)
    y = rng.normal(size=30)
    assert _dtw_band(x, x, 3) == 0.0
    assert _dtw_band(x, y, 3) == pytest.approx(_dtw_band(y, x, 3))
    # band=0 degenerates to euclidean distance
    assert _dtw_band(x, y, 0) == pytest.approx(
        float(np.sqrt(np.sum((x - y) ** 2)))
    )


def test_lb_keogh_is_a_lower_bound():
    rng = np.random.default_rng(13)
    for _ in range(50):
        x = rng.integers(0, 8, size=30).astype(float)
        y = rng.integers(0, 8, size=30).astype(float)
        for r in (1, 3, 5):
            assert _lb_keogh(x, y, r) <= _dtw_band(x, y, r) + 1e-9


def test_sax_letters_are_exact_quartile_ranks(spark):
    lett = sax_letters(spark, SF).collect()
    by_user = {}
    for row in lett:
        by_user.setdefault(row.user_id, []).append(row)
    assert len(by_user) == 15
    for rows in by_user.values():
        rows.sort(key=lambda r: r.seg)
        assert len(rows) == 10  # 30 days / 3-day segments
        # recompute ntile(4) over (n, seg) independently
        order = sorted(range(10), key=lambda i: (rows[i].n, rows[i].seg))
        sizes = [3, 3, 2, 2]  # 10 rows into 4 tiles
        expect = {}
        pos = 0
        for tile, sz in enumerate(sizes):
            for i in order[pos: pos + sz]:
                expect[i] = "abcd"[tile]
            pos += sz
        for i, row in enumerate(rows):
            assert row.letter == expect[i], (row, expect[i])


def test_sax_word_total_events_conserved(spark):
    rows = q_sax_words(spark, SF).collect()
    assert sum(r.n_events for r in rows) == 1000
    assert all(len(r.word) == 10 for r in rows)


def test_dtw_knn_distances_match_brute_force_and_quality(spark):
    """Two pins: (a) every reported (probe, neighbor) distance equals
    the NumPy banded DTW for that pair exactly — the Arrow funnel
    never corrupts the kernel; (b) the ANN quality contract — the
    found neighbor's distance is within 1.25x of the TRUE nearest for
    most probes (the testdata series are unclustered noise, the
    hardest case for any sublinear method, so exact recall@1 is not
    the contract — distance ratio is, as for the embedding ANN ops)."""
    series = {
        r.user_id: _znorm(np.array(r.series))
        for r in user_series(spark, SF).collect()
    }
    got = {r.user_id: r for r in q_dtw_knn(spark, SF).collect()}
    assert set(got) <= set(series)

    users = sorted(series)
    true_nn = {
        u: min(
            (_dtw_band(series[u], series[v], 3), v)
            for v in users
            if v != u
        )
        for u in users
    }
    ratios = []
    for u, r in got.items():
        exact = _dtw_band(series[u], series[r.nn_user_id], 3)
        assert r.dtw_dist == pytest.approx(exact, abs=1e-3)
        ratios.append(exact / max(true_nn[u][0], 1e-12))
    assert len(got) >= 12  # nearly every user reaches the verify stage
    within = sum(1 for x in ratios if x <= 1.25)
    assert within / len(ratios) >= 0.6, sorted(ratios)


def test_dtw_knn_finds_true_neighbors_on_clustered_series(spark):
    """On data with real shape structure (pairs of near-identical
    series), the funnel must pair every series with its twin — the
    case blocking exists for."""
    rng = np.random.default_rng(99)
    base = [
        np.sin(np.linspace(0, 2 * np.pi, 30)) * 5 + 5,
        np.linspace(0, 10, 30),
        np.concatenate([np.full(15, 8.0), np.full(15, 1.0)]),
        np.abs(np.linspace(-5, 5, 30)),
    ]
    rows = []
    for i in range(40):
        proto = base[i % 4]
        noisy = np.clip(proto + rng.normal(scale=0.3, size=30), 0, None)
        rows.append((i, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, "user_id long, series array<double>")
    got = dtw_nearest_neighbor(df).collect()
    assert len(got) >= 35
    same_proto = sum(1 for r in got if r.nn_user_id % 4 == r.user_id % 4)
    assert same_proto / len(got) >= 0.9, got


def test_dtw_knn_hot_block_cap_drops_unselective_blocks(spark):
    """With a tiny cap every block is hot -> no candidates -> empty
    result (not an error, and never a pair explosion)."""
    out = dtw_nearest_neighbor(user_series(spark, SF), hot_block_cap=0)
    assert out.count() == 0
