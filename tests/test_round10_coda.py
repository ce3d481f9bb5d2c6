"""Round-10 coda operators vs pure-Python reference implementations.

The DuckDB oracle twins are the driver gate; these pin the MATH
against independent reimplementations (the BPE/Kruskal pattern), so an
oracle that drifted in lockstep with the Spark side would still fail.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators import analytic as A
from datapoints_csv_extractor_spark.operators import textops as X
from datapoints_csv_extractor_spark.operators.relational import load

SF = "/root/testdata/sf0.001"


def _cents(v: float) -> int:
    return int(math.floor(v * 100.0 + 0.5))


@pytest.fixture(scope="module")
def events(spark):
    return [
        (r.event_type, r.user_id, _cents(r.value), r.ts)
        for r in load(spark, SF, "events").collect()
    ]


def test_kendall_tau_matches_quadratic_reference(spark, events):
    per_user: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for t, u, c, _ in events:
        if t == "click":
            per_user[u][0] += c
        elif t == "purchase":
            per_user[u][1] += c
    pts = [
        (min(x // 50000, 20), min(y // 50000, 20))
        for x, y in per_user.values()
    ]
    conc = disc = 0
    for i in range(len(pts)):
        for j in range(len(pts)):
            if i == j:
                continue
            (ax, ay), (bx, by) = pts[i], pts[j]
            if bx > ax and by > ay:
                conc += 1
            elif bx > ax and by < ay:
                disc += 1
    n = len(pts)
    tx = Counter(p[0] for p in pts)
    ty = Counter(p[1] for p in pts)
    n0x2 = n * (n - 1)
    tiex2 = sum(t * (t - 1) for t in tx.values())
    tiey2 = sum(t * (t - 1) for t in ty.values())
    tau = (conc - disc) / math.sqrt(
        float(n0x2 - tiex2) * float(n0x2 - tiey2)
    ) * 2.0
    row = A.q_kendall_tau(spark, SF).first()
    assert row.n_users == n
    assert row.concordant == conc and row.discordant == disc
    assert float(row.kendall_tau_b) == round(tau, 6)


def test_effect_sizes_match_reference(spark, events):
    a = [c for t, _, c, _ in events if t == "click"]
    b = [c for t, _, c, _ in events if t == "purchase"]
    na, nb = len(a), len(b)
    va = (na * sum(x * x for x in a) - sum(a) ** 2) / (na * (na - 1))
    vb = (nb * sum(x * x for x in b) - sum(b) ** 2) / (nb * (nb - 1))
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = (sum(a) / na - sum(b) / nb) / sp
    g = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
    # Cliff's delta by brute force: P(a > b) - P(a < b).
    bc = Counter(b)
    gt = lt = 0
    for x in a:
        for y, cnt in bc.items():
            if x > y:
                gt += cnt
            elif x < y:
                lt += cnt
    delta = (gt - lt) / (na * nb)
    row = A.q_effect_sizes(spark, SF).first()
    assert (row.n_a, row.n_b) == (na, nb)
    assert float(row.cohens_d) == pytest.approx(round(d, 6), abs=2e-6)
    assert float(row.hedges_g) == pytest.approx(round(g, 6), abs=2e-6)
    assert float(row.cliffs_delta) == pytest.approx(
        round(delta, 6), abs=2e-6
    )


def test_mutual_information_matches_reference(spark, events):
    cells = Counter(
        (t, min(c // 500, 19)) for t, _, c, _ in events
    )
    n = sum(cells.values())
    nt = Counter()
    nb = Counter()
    for (t, b), c in cells.items():
        nt[t] += c
        nb[b] += c
    mi = sum(
        round(c / n * math.log(c * n / (nt[t] * nb[b])), 6)
        for (t, b), c in cells.items()
    )
    ht = sum(round(-(c / n) * math.log(c / n), 6) for c in nt.values())
    hb = sum(round(-(c / n) * math.log(c / n), 6) for c in nb.values())
    row = A.q_mutual_information(spark, SF).first()
    assert row.n_events == n
    assert float(row.mi_nats) == pytest.approx(mi, abs=1e-9)
    assert float(row.h_type) == pytest.approx(ht, abs=1e-9)
    assert float(row.h_bucket) == pytest.approx(hb, abs=1e-9)
    assert float(row.nmi) == pytest.approx(
        round(mi / math.sqrt(ht * hb), 6), abs=2e-6
    )
    # Association exists in the synthetic data (purchase values skew),
    # so the read must be non-degenerate.
    assert 0.0 < float(row.nmi) < 1.0


def test_gumbel_block_maxima_matches_reference(spark, events):
    blocks: dict[object, int] = {}
    for _, _, c, ts in events:
        d = ts.date()
        blocks[d] = max(blocks.get(d, 0), c)
    xs = list(blocks.values())
    n = len(xs)
    mean = sum(xs) / n / 100.0
    sd = math.sqrt(
        (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    ) / 100.0
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 365.0))
    row = A.q_gumbel_block_maxima(spark, SF).first()
    assert row.n_blocks == n
    assert float(row.gumbel_mu) == pytest.approx(round(mu, 6), abs=2e-6)
    assert float(row.gumbel_beta) == pytest.approx(
        round(beta, 6), abs=2e-6
    )
    assert float(row["return_level_365d"]) == pytest.approx(
        round(rl, 6), abs=2e-6
    )
    # The return level must sit above the observed mean block max.
    assert float(row["return_level_365d"]) > mean


def test_retention_cohorts_match_reference(spark, events):
    import datetime

    epoch = datetime.date(2024, 1, 1)
    first: dict[int, int] = {}
    weeks: set[tuple[int, int]] = set()
    for _, u, _, ts in events:
        w = (ts.date() - epoch).days // 7
        weeks.add((u, w))
        first[u] = min(first.get(u, w), w)
    sizes = Counter(first.values())
    ret = Counter((first[u], w - first[u]) for u, w in weeks)
    rows = A.q_retention_cohorts(spark, SF).collect()
    assert len(rows) == len(ret)
    for r in rows:
        key = (r.cohort_week, r.week_offset)
        assert r.n_active == ret[key]
        assert r.n_cohort == sizes[r.cohort_week]
        assert float(r.retention) == round(
            ret[key] / sizes[r.cohort_week], 4
        )
    # Offset 0 is always 100% (everyone is active in their first week).
    for r in rows:
        if r.week_offset == 0:
            assert float(r.retention) == 1.0


def test_burstiness_fano_matches_reference(spark, events):
    hours = Counter(
        (t, int(ts.timestamp()) // 3600) for t, _, _, ts in events
    )
    by_type: dict[str, list[int]] = defaultdict(list)
    for (t, _), c in hours.items():
        by_type[t].append(c)
    rows = {r.event_type: r for r in A.q_burstiness_fano(spark, SF).collect()}
    h = 720
    for t, cs in by_type.items():
        n = sum(cs)
        sxx = sum(c * c for c in cs)
        fano = (h * sxx - n * n) / (h * n)
        assert rows[t].n_events == n
        assert rows[t].n_active_hours == len(cs)
        assert float(rows[t].fano_factor) == round(fano, 6)


def test_burstiness_fano_guards_undersized_hour_grid(spark):
    """A grid smaller than the corpus's active hours would flip
    H*sxx - N^2 negative; the plan's raise_error guard must fail
    loud instead of reporting a nonsense Fano factor (round-10
    advice, the Boruvka convergence-guard pattern)."""
    import pytest

    with pytest.raises(Exception, match="more active hours"):
        A.q_burstiness_fano(spark, SF, n_hours=2).collect()


def _tokens(text: str) -> list[str]:
    return [t for t in text.strip().split() if t]


def test_countmin_estimate_upper_bounds_and_matches_reference(spark):
    docs = load(spark, SF, "documents").select("text").collect()
    freq = Counter(t for r in docs for t in _tokens(r.text))
    depth, width = 4, 256

    def bucket(i: int, tok: str) -> int:
        h = hashlib.md5(f"cms:{i}:{tok}".encode()).hexdigest()
        return int(h[:8], 16) % width

    cells = Counter()
    for tok, f in freq.items():
        for i in range(depth):
            cells[(i, bucket(i, tok))] += f
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = X.q_countmin_sketch(spark, SF).collect()
    assert [(r.tok, r.exact_count) for r in rows] == top
    for r in rows:
        est = min(cells[(i, bucket(i, r.tok))] for i in range(depth))
        assert r.cm_estimate == est
        # The Count-Min guarantee: never below truth.
        assert r.cm_estimate >= r.exact_count
        assert r.overestimate == est - r.exact_count


def test_simpson_diversity_matches_reference(spark):
    docs = load(spark, SF, "documents").select("source", "text").collect()
    freq: dict[str, Counter] = defaultdict(Counter)
    for r in docs:
        freq[r.source].update(_tokens(r.text))
    rows = {r.source: r for r in X.q_simpson_diversity(spark, SF).collect()}
    assert set(rows) == set(freq)
    for src, fc in freq.items():
        n = sum(fc.values())
        s2m = sum(f * (f - 1) for f in fc.values())
        s2 = sum(f * f for f in fc.values())
        gs = round(1.0 - s2m / (n * (n - 1)), 6)
        hhi = round(s2 / (n * n), 6)
        r = rows[src]
        assert r.n_tokens == n and r.vocab == len(fc)
        assert float(r.gini_simpson) == gs
        assert float(r.hhi) == hhi
        assert float(r.effective_vocab) == round(1.0 / hhi, 2)


def test_ols_normal_equations_matches_reference(spark, events):
    per_user: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for t, u, c, _ in events:
        if t == "purchase":
            per_user[u][0] += c
        elif t == "click":
            per_user[u][1] += 1
        elif t == "view":
            per_user[u][2] += 1
    ys = [v[0] for v in per_user.values()]
    x1 = [v[1] for v in per_user.values()]
    x2 = [v[2] for v in per_user.values()]
    n = len(ys)
    s1, s2 = sum(x1), sum(x2)
    s11 = sum(a * a for a in x1)
    s12 = sum(a * b for a, b in zip(x1, x2))
    s22 = sum(b * b for b in x2)
    sy = sum(ys)
    s1y = sum(a * y for a, y in zip(x1, ys))
    s2y = sum(b * y for b, y in zip(x2, ys))
    syy = sum(y * y for y in ys)
    nf, s1f, s2f = float(n), float(s1), float(s2)
    det = (
        nf * (s11 * s22 - s12 * s12)
        - s1f * (s1f * s22 - s12 * s2f)
        + s2f * (s1f * s12 - s11 * s2f)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1f * (s1y * s22 - s12 * s2y)
        + s2f * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        nf * (s1y * s22 - s12 * s2y)
        - sy * (s1f * s22 - s12 * s2f)
        + s2f * (s1f * s2y - s1y * s2f)
    )
    det2 = (
        nf * (s11 * s2y - s1y * s12)
        - s1f * (s1f * s2y - s1y * s2f)
        + sy * (s1f * s12 - s11 * s2f)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = syy - sy * sy / nf
    row = A.q_ols_normal_equations(spark, SF).first()
    assert row.n_users == n
    assert float(row.intercept) == pytest.approx(
        round(b0 / 100.0, 6), abs=2e-6
    )
    assert float(row.beta_clicks) == pytest.approx(
        round(b1 / 100.0, 6), abs=2e-6
    )
    assert float(row.beta_views) == pytest.approx(
        round(b2 / 100.0, 6), abs=2e-6
    )
    assert float(row.r_squared) == pytest.approx(
        round(1.0 - sse / sst, 6), abs=2e-6
    )
    assert 0.0 <= float(row.r_squared) <= 1.0


def test_filter_mcc_consistent_with_kappa_confusion(spark):
    """MCC must be the textbook formula over the SAME 2x2 confusion
    q_filter_kappa reports (both compose the gates verbatim, so the
    cells must agree exactly and MCC follows from them)."""
    from datapoints_csv_extractor_spark.operators import curation as C

    k = C.q_filter_kappa(spark, SF).first()
    m = C.q_filter_mcc(spark, SF).first()
    assert (
        m.n_docs, m.n_both_pass, m.n_both_fail,
        m.n_gopher_only, m.n_c4_only,
    ) == (
        k.n_docs, k.n_both_pass, k.n_both_fail,
        k.n_gopher_only, k.n_c4_only,
    )
    tp, tn = m.n_both_pass, m.n_both_fail
    fp, fn = m.n_c4_only, m.n_gopher_only
    mcc = (tp * tn - fp * fn) / math.sqrt(
        float((tp + fp) * (tp + fn)) * float((tn + fp) * (tn + fn))
    )
    assert float(m.mcc) == pytest.approx(round(mcc, 6), abs=2e-6)


def test_bleu_pairs_matches_reference(spark):
    """BLEU-2 over neighbor pairs vs a textbook Python BLEU: clipped
    n-gram precision, brevity penalty, geometric mean — per-source
    mean (exact integer half-up of micro-BLEU) and max."""
    docs = load(spark, SF, "documents").select(
        "source", "doc_id", "text"
    ).collect()
    by_src: dict[str, list] = defaultdict(list)
    for r in docs:
        by_src[r.source].append((r.doc_id, _tokens(r.text)))

    def bleu2(cand: list[str], ref: list[str]) -> float:
        if len(cand) < 2:
            return 0.0

        def clip(cg, rg):
            rc = Counter(rg)
            return sum(min(c, rc[g]) for g, c in Counter(cg).items())

        big = lambda t: [  # noqa: E731
            f"{a} {b}" for a, b in zip(t, t[1:])
        ]
        c1 = clip(cand, ref)
        c2 = clip(big(cand), big(ref))
        if c1 == 0 or c2 == 0:
            return 0.0
        p1 = c1 / len(cand)
        p2 = c2 / (len(cand) - 1)
        bp = min(1.0, math.exp(1.0 - len(ref) / len(cand)))
        return round(bp * math.sqrt(p1 * p2), 6)

    expect = {}
    for src, items in by_src.items():
        items.sort()
        micros = [
            int(round(bleu2(a[1], b[1]) * 1e6))
            for a, b in zip(items, items[1:])
        ]
        n = len(micros)
        expect[src] = (
            n,
            ((2 * sum(micros) + n) // (2 * n)) / 1e6,
            max(micros) / 1e6,
        )
    rows = {r.source: r for r in X.q_bleu_pairs(spark, SF).collect()}
    assert set(rows) == set(expect)
    for src, (n, mean, mx) in expect.items():
        r = rows[src]
        assert r.n_pairs == n
        assert float(r.mean_bleu2) == pytest.approx(mean, abs=2e-6)
        assert float(r.max_bleu2) == pytest.approx(mx, abs=2e-6)
    # Non-degenerate: some neighbor pair overlaps (the corpus carries
    # planted near-dups), and BLEU stays in [0, 1].
    assert any(r.max_bleu2 > 0 for r in rows.values())
    assert all(0.0 <= r.max_bleu2 <= 1.0 for r in rows.values())
