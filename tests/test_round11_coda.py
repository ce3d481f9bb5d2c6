"""Round-11 coda operators vs pure-Python reference implementations.

The DuckDB oracle twins are the driver gate; these pin the MATH
against independent reimplementations (the BPE/Kruskal pattern), so an
oracle that drifted in lockstep with the Spark side would still fail.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from datapoints_csv_extractor_spark.operators import analytic as A
from datapoints_csv_extractor_spark.operators import curation as C
from datapoints_csv_extractor_spark.operators import textops as X
from datapoints_csv_extractor_spark.operators.relational import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return [
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in load(spark, SF, "documents").collect()
    ]


def _tokens(text: str) -> list[str]:
    return [t for t in text.strip().split() if t]


def test_gini_matches_sorted_rank_reference(spark, docs):
    by_src: dict[str, list[int]] = defaultdict(list)
    for _, _, _, src, n_chars in docs:
        by_src[src].append(n_chars)
    rows = {r.source: r for r in A.q_gini_coefficient(spark, SF).collect()}
    assert set(rows) == set(by_src)
    for src, xs in by_src.items():
        xs.sort()
        n, s = len(xs), sum(xs)
        s_ix = sum(i * x for i, x in enumerate(xs, start=1))
        gini = (2 * s_ix - (n + 1) * s) / (n * s)
        assert rows[src].n_docs == n
        assert rows[src].total_chars == s
        assert float(rows[src].gini) == pytest.approx(
            round(gini, 6), abs=2e-6
        )
        # Gini of a finite nonnegative sample is in [0, 1).
        assert 0.0 <= float(rows[src].gini) < 1.0


def test_gini_extremes(spark, tmp_path):
    """Equal lengths -> 0; one doc owning ~all mass -> near (n-1)/n."""
    eq = [(i, "x", "en", "s_eq", 100) for i in range(10)]
    sk = [(100 + i, "x", "en", "s_skew", 1) for i in range(9)] + [
        (200, "x", "en", "s_skew", 100000)
    ]
    spark.createDataFrame(
        eq + sk, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.source: float(r.gini)
        for r in A.q_gini_coefficient(spark, str(tmp_path)).collect()
    }
    assert rows["s_eq"] == 0.0
    assert rows["s_skew"] > 0.85


def test_cramers_v_matches_reference(spark, docs):
    cells = Counter((src, lang) for _, _, lang, src, _ in docs)
    rt = Counter()
    ct = Counter()
    for (s, l), o in cells.items():
        rt[s] += o
        ct[l] += o
    n = sum(cells.values())
    chi2 = sum(
        round(
            (o * n - rt[s] * ct[l]) ** 2 / (n * rt[s] * ct[l]), 6
        )
        for (s, l), o in cells.items()
    )
    v = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    row = A.q_cramers_v(spark, SF).collect()[0]
    assert row.n_docs == n
    assert row.n_sources == len(rt) and row.n_langs == len(ct)
    assert float(row.chi2) == pytest.approx(chi2, abs=2e-5)
    assert float(row.cramers_v) == pytest.approx(round(v, 6), abs=2e-6)
    assert 0.0 <= float(row.cramers_v) <= 1.0


def test_theils_u_matches_entropy_reference(spark, docs):
    cells = Counter((src, lang) for _, _, lang, src, _ in docs)
    ns = Counter()
    nl = Counter()
    for (s, l), o in cells.items():
        ns[s] += o
        nl[l] += o
    n = sum(cells.values())
    hj = sum(round(-(o / n) * math.log(o / n), 6) for o in cells.values())
    hs = sum(round(-(o / n) * math.log(o / n), 6) for o in ns.values())
    hl = sum(round(-(o / n) * math.log(o / n), 6) for o in nl.values())
    row = A.q_theils_u(spark, SF).collect()[0]
    assert float(row.h_joint) == pytest.approx(hj, abs=2e-6)
    assert float(row.u_lang_given_source) == pytest.approx(
        round((hl + hs - hj) / hl, 6), abs=2e-6
    )
    assert float(row.u_source_given_lang) == pytest.approx(
        round((hl + hs - hj) / hs, 6), abs=2e-6
    )
    # Uncertainty coefficients live in [0, 1]; independence -> ~0.
    assert 0.0 <= float(row.u_lang_given_source) <= 1.0
    assert 0.0 <= float(row.u_source_given_lang) <= 1.0


def test_wasserstein_matches_cdf_reference(spark, docs):
    lengths = sorted({x for *_, x in docs})
    by_src: dict[str, Counter] = defaultdict(Counter)
    for _, _, _, src, x in docs:
        by_src[src][x] += 1
    n = len(docs)
    rows = {r.source: r for r in A.q_wasserstein_1d(spark, SF).collect()}
    for src, cnt in by_src.items():
        na = sum(cnt.values())
        nb = n - na
        cum_a = cum_all = 0
        total = 0
        all_cnt = Counter(x for *_, x in docs)
        for v, nxt in zip(lengths, lengths[1:]):
            cum_a += cnt.get(v, 0)
            cum_all += all_cnt[v]
            total += abs(cum_a * nb - (cum_all - cum_a) * na) * (nxt - v)
        w1 = total / (na * nb)
        assert rows[src].n_docs == na and rows[src].n_rest == nb
        assert float(rows[src].w1_chars) == pytest.approx(
            round(w1, 6), abs=2e-6
        )


def test_wasserstein_identical_distributions_is_zero(spark, tmp_path):
    rows = [
        (i, "x", "en", f"s{i % 2}", 100 + (i // 2) % 7) for i in range(56)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: float(r.w1_chars)
        for r in A.q_wasserstein_1d(spark, str(tmp_path)).collect()
    }
    assert out == {"s0": 0.0, "s1": 0.0}


def _coin(user_id: int, p: int) -> int:
    h = hashlib.md5(f"pt:{user_id}:{p}".encode()).hexdigest()
    return int(h[:8], 16) % 2


def test_permutation_test_matches_reference(spark):
    ev = [
        (r.event_type, r.user_id, int(math.floor(r.value * 100.0 + 0.5)))
        for r in load(spark, SF, "events").collect()
        if r.event_type in ("purchase", "click")
    ]
    per_user: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for t, u, c in ev:
        if t == "purchase":
            per_user[u][0] += c
            per_user[u][1] += 1
        else:
            per_user[u][2] += c
            per_user[u][3] += 1
    d = {
        u: sp * cc - sc * cp
        for u, (sp, cp, sc, cc) in per_user.items()
        if cp > 0 and cc > 0
    }
    t_obs = sum(d.values())
    n_extreme = 0
    for p in range(1, 201):
        t_p = sum(v if _coin(u, p) == 0 else -v for u, v in d.items())
        if abs(t_p) >= abs(t_obs):
            n_extreme += 1
    row = A.q_permutation_test(spark, SF).collect()[0]
    assert row.n_users == len(d)
    assert float(row.t_obs) == float(t_obs)
    assert row.n_extreme == n_extreme
    assert float(row.p_value) == round((n_extreme + 1) / 201, 6)
    # The add-one MC p-value is always in (0, 1].
    assert 0.0 < float(row.p_value) <= 1.0


def test_mcnemar_cells_consistent_with_kappa_confusion(spark):
    """The discordant cells must equal q_filter_mcc's off-diagonal
    (same composed gates), and both statistics must match the
    closed form."""
    mcc = C.q_filter_mcc(spark, SF).collect()[0]
    row = C.q_mcnemar_filters(spark, SF).collect()[0]
    assert row.n_docs == mcc.n_docs
    assert row.n_gopher_only == mcc.n_gopher_only
    assert row.n_c4_only == mcc.n_c4_only
    b, c = row.n_gopher_only, row.n_c4_only
    if b + c > 0:
        assert float(row.mcnemar_chi2) == round((b - c) ** 2 / (b + c), 6)
        cc = max(abs(b - c) - 1, 0)
        assert float(row.mcnemar_chi2_cc) == round(cc * cc / (b + c), 6)
    else:
        assert row.mcnemar_chi2 is None


def test_chao1_and_good_turing_match_spectrum_reference(spark, docs):
    by_src: dict[str, Counter] = defaultdict(Counter)
    for _, text, _, src, _ in docs:
        by_src[src].update(_tokens(text))
    chao = {r.source: r for r in X.q_chao1_richness(spark, SF).collect()}
    gt = {r.source: r for r in X.q_good_turing(spark, SF).collect()}
    for src, freq in by_src.items():
        spec = Counter(freq.values())
        v, f1, f2 = len(freq), spec[1], spec[2]
        est = v + f1 * (f1 - 1) / (2.0 * (f2 + 1))
        assert chao[src].vocab == v
        assert chao[src].n_hapax == f1 and chao[src].n_doubleton == f2
        assert float(chao[src].chao1) == pytest.approx(
            round(est, 6), abs=2e-6
        )
        # Chao1 never estimates FEWER types than observed.
        assert float(chao[src].chao1) >= v
        n = sum(freq.values())
        assert gt[src].n_tokens == n
        assert float(gt[src].p_unseen) == round(f1 / n, 6)
        if f1 > 0:
            assert float(gt[src].r1_star) == round(2 * spec[2] / f1, 6)
        if spec[2] > 0:
            assert float(gt[src].r2_star) == round(3 * spec[3] / spec[2], 6)


def test_log_odds_dirichlet_matches_reference(spark, docs):
    ya = Counter()
    yb = Counter()
    for _, text, lang, _, _ in docs:
        (ya if lang == "en" else yb).update(_tokens(text))
    vocab = set(ya) | set(yb)
    na, nb, v = sum(ya.values()), sum(yb.values()), len(vocab)
    top = sorted(vocab, key=lambda t: (-(ya[t] + yb[t]), t))[:25]
    out = {r.tok: r for r in X.q_log_odds_dirichlet(spark, SF).collect()}
    assert set(out) == set(top)
    for t in top:
        delta = (
            round(math.log(ya[t] + 1), 6)
            - round(math.log(na + v - ya[t] - 1), 6)
            - round(math.log(yb[t] + 1), 6)
            + round(math.log(nb + v - yb[t] - 1), 6)
        )
        var = round(1.0 / (ya[t] + 1) + 1.0 / (yb[t] + 1), 6)
        assert out[t].count_a == ya[t] and out[t].count_b == yb[t]
        assert float(out[t].log_odds) == pytest.approx(delta, abs=2e-6)
        assert float(out[t].z) == pytest.approx(
            round(delta / math.sqrt(var), 4), abs=2e-4
        )


def test_ngram_novelty_matches_reference_and_detects_templates(
    spark, docs, tmp_path
):
    def is_test(doc_id: int) -> bool:
        return int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16
        ) % 4 == 0

    def grams(text: str) -> set[str]:
        ws = _tokens(text)
        return {
            " ".join(ws[i : i + 8]) for i in range(len(ws) - 7)
        } if len(ws) >= 8 else set()

    train: set[str] = set()
    test_by_src: dict[str, set[str]] = defaultdict(set)
    for doc_id, text, _, src, _ in docs:
        g = grams(text)
        if is_test(doc_id):
            test_by_src[src] |= g
        else:
            train |= g
    rows = {r.source: r for r in X.q_ngram_novelty(spark, SF).collect()}
    assert set(rows) == {s for s, g in test_by_src.items() if g}
    for src, g in test_by_src.items():
        if not g:
            continue
        novel = len(g - train)
        assert rows[src].n_test_grams == len(g)
        assert rows[src].n_novel == novel
        assert float(rows[src].novelty) == round(novel / len(g), 6)

    # Planted template corpus: every doc identical -> novelty 0.
    text = " ".join(f"w{i}" for i in range(20))
    tpl = [(i, text, "en", "tpl", len(text)) for i in range(40)]
    spark.createDataFrame(
        tpl, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = X.q_ngram_novelty(spark, str(tmp_path)).collect()
    assert len(out) == 1 and float(out[0].novelty) == 0.0


def test_mann_kendall_matches_pair_reference(spark):
    ev = [
        (r.event_type, r.ts.date(), int(math.floor(r.value * 100.0 + 0.5)))
        for r in load(spark, SF, "events").collect()
    ]
    daily: dict[tuple, int] = defaultdict(int)
    for t, day, c in ev:
        daily[(t, day)] += c
    by_type: dict[str, list[tuple]] = defaultdict(list)
    for (t, day), x in daily.items():
        by_type[t].append((day, x))
    rows = {r.event_type: r for r in A.q_mann_kendall_trend(spark, SF).collect()}
    for t, pts in by_type.items():
        pts.sort()
        xs = [x for _, x in pts]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie_term = sum(t_ * (t_ - 1) * (2 * t_ + 5) for t_ in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        z = (
            (s - 1) / math.sqrt(var_s)
            if s > 0
            else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
        )
        assert rows[t].n_days == n
        assert rows[t].s == s
        assert float(rows[t].var_s) == pytest.approx(round(var_s, 6), abs=2e-6)
        assert float(rows[t].z) == pytest.approx(round(z, 4), abs=2e-4)


def test_mann_kendall_detects_planted_trend(spark, tmp_path):
    """A strictly increasing series must hit the theoretical max
    S = n(n-1)/2 and flag trending; a constant one gives S = 0."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for i in range(30):
        ts = base + datetime.timedelta(days=i)
        rows.append((i, ts, 1, "up", 1.0 * (i + 1), "{}"))
        rows.append((1000 + i, ts, 2, "flat", 5.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in A.q_mann_kendall_trend(
        spark, str(tmp_path)).collect()}
    assert out["up"].s == 30 * 29 // 2 and bool(out["up"].trending)
    assert out["flat"].s == 0 and not bool(out["flat"].trending)


def test_seasonality_chi2_matches_reference(spark):
    ev = [
        (r.event_type, r.ts.hour)
        for r in load(spark, SF, "events").collect()
    ]
    cells: dict[str, Counter] = defaultdict(Counter)
    for t, h in ev:
        cells[t][h] += 1
    rows = {r.event_type: r for r in A.q_seasonality_chi2(spark, SF).collect()}
    for t, byh in cells.items():
        n = sum(byh.values())
        dev2 = sum((24 * o - n) ** 2 for o in byh.values())
        dev2 += (24 - len(byh)) * n * n
        chi2 = dev2 / (24.0 * n)
        assert rows[t].n_events == n
        assert rows[t].hours_seen == len(byh)
        assert float(rows[t].chi2) == pytest.approx(round(chi2, 6), abs=2e-6)
        # chi2 against uniform of a uniform-ish synthetic stream stays
        # near dof=23; the identity sum(o)=n makes chi2 >= 0 always.
        assert float(rows[t].chi2) >= 0.0


def test_vocab_jaccard_matches_set_reference(spark, docs):
    vocab: dict[str, set] = defaultdict(set)
    for _, text, _, src, _ in docs:
        vocab[src].update(_tokens(text))
    rows = {
        (r.sa, r.sb): r
        for r in X.q_vocab_jaccard_matrix(spark, SF).collect()
    }
    srcs = sorted(vocab)
    n_pairs = len(srcs) * (len(srcs) - 1) // 2
    assert len(rows) == n_pairs
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            inter = len(vocab[sa] & vocab[sb])
            union = len(vocab[sa] | vocab[sb])
            r = rows[(sa, sb)]
            assert r.inter == inter
            assert r.vocab_a == len(vocab[sa]) and r.vocab_b == len(vocab[sb])
            assert float(r.jaccard) == round(inter / union, 6)


def test_token_burstiness_matches_reference(spark, docs):
    cf = Counter()
    df = Counter()
    for _, text, _, _, _ in docs:
        ts = _tokens(text)
        cf.update(ts)
        df.update(set(ts))
    n_docs = len(docs)
    top = sorted(cf, key=lambda t: (-cf[t], t))[:30]
    rows = {r.tok: r for r in X.q_token_burstiness(spark, SF).collect()}
    assert set(rows) == set(top)
    for t in top:
        r = rows[t]
        assert r.cf == cf[t] and r.df == df[t]
        assert float(r.burstiness) == round(cf[t] / df[t], 6)
        pdf = round(n_docs * (1.0 - math.exp(-cf[t] / n_docs)), 6)
        assert float(r.poisson_df) == pytest.approx(pdf, abs=2e-6)
        # Burstiness >= 1 by construction (cf >= df), and observed df
        # can never exceed the doc count.
        assert float(r.burstiness) >= 1.0 and r.df <= n_docs


def test_bigram_cond_entropy_matches_reference_and_template_zero(
    spark, docs, tmp_path
):
    cells: dict[str, Counter] = defaultdict(Counter)
    for _, text, _, src, _ in docs:
        ws = _tokens(text)
        for i in range(len(ws) - 1):
            cells[src][(ws[i], ws[i + 1])] += 1
    rows = {r.source: r for r in X.q_bigram_cond_entropy(spark, SF).collect()}
    for src, c in cells.items():
        n = sum(c.values())
        c1 = Counter()
        for (w1, _), v in c.items():
            c1[w1] += v
        h = sum(
            round(-(v / n) * math.log(v / c1[w1]), 6)
            for (w1, _), v in c.items()
        )
        assert rows[src].n_bigrams == n
        assert float(rows[src].cond_entropy) == pytest.approx(h, abs=2e-6)
        assert float(rows[src].branch_perplexity) == pytest.approx(
            round(math.exp(h), 4), abs=2e-4
        )

    # Fully deterministic successor chain -> zero conditional entropy.
    text = " ".join(f"w{i}" for i in range(15))
    tpl = [(i, text, "en", "tpl", len(text)) for i in range(20)]
    spark.createDataFrame(
        tpl, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = X.q_bigram_cond_entropy(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert float(out[0].cond_entropy) == 0.0
    assert float(out[0].branch_perplexity) == 1.0
