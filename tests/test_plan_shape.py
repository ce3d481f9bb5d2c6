"""Physical-plan shape tests: the scale properties the engine promises.

Correctness is pinned by the oracle; these pin the EXECUTION hygiene
that matters at 100 TB — filter/column pushdown into the parquet scan,
broadcast (not shuffle) joins for dimensions, shuffle-free ingest,
whole-stage codegen on hot paths. A regression here is a performance
bug even when results stay right.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators import relational as R
from datapoints_csv_extractor_spark.operators.relational import load

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(R.q1_pricing_summary(spark, SF))
    # Ship-date predicate reaches the parquet scan.
    assert "PushedFilters:" in plan
    assert re.search(r"PushedFilters:.*l_shipdate", plan)
    # Column pruning: the scan must NOT read l_comment (widest column).
    m = re.search(r"ReadSchema: (.+)", plan)
    assert m and "l_comment" not in m.group(1)


def test_range_filter_pushdown(spark):
    plan = _plan(R.q_range_filter(spark, SF))
    assert re.search(r"PushedFilters:.*GreaterThan.*ts", plan) or re.search(
        r"PushedFilters:.*ts.*GreaterThan", plan
    ), plan[plan.find("PushedFilters") : plan.find("PushedFilters") + 300]


def test_q5_dimension_joins_broadcast(spark):
    """All dimension joins broadcast; the only shuffle exchanges allowed
    are for the final aggregation (and AQE reads), never a sort-merge
    join of the fact against a dimension."""
    plan = _plan(R.q5_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tebis_ingest_is_shuffle_free(spark, tmp_path):
    from datapoints_csv_extractor_spark.sources.tebis_csv import read_datapoints
    from fixtures import write_tebis_csv

    folder = tmp_path / "in"
    folder.mkdir()
    p1 = write_tebis_csv(folder, file_ts=1550092560, n_series=3, n_rows=10, seed=1)
    p2 = write_tebis_csv(folder, file_ts=1550092620, n_series=5, n_rows=10, seed=2)
    plan = _plan(read_datapoints(spark, [p1, p2]))
    # Header-dimension join broadcasts; the data path never shuffles
    # (the only Exchange allowed is the broadcast one).
    assert "BroadcastHashJoin" in plan
    assert not re.findall(r"\(\d+\) Exchange\b(?!.*broadcast)", plan)
    assert "SortMergeJoin" not in plan
    # Unpivot runs as Generate (posexplode). (Codegen spans only show
    # in the post-execution AQE final plan, so not asserted here.)
    assert "Generate" in plan


def test_anti_join_broadcasts_build_side(spark):
    plan = _plan(R.q_anti_join(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(R.q_topk_newest(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_token_stats_single_projection_no_shuffle(spark):
    from datapoints_csv_extractor_spark.operators.textops import q_token_stats

    plan = _plan(q_token_stats(spark, SF))
    assert "Exchange" not in plan
    # Tokenizer array is materialized once (aliased), then reused —
    # the expensive split must appear exactly once in the plan.
    assert plan.count("array_remove(split(") == 1


def test_knn_is_single_pass_take_ordered(spark):
    from datapoints_csv_extractor_spark.operators.similarity import (
        q_knn_brute_force,
    )

    plan = _plan(q_knn_brute_force(spark, SF))
    # Exact top-k: one scan + TakeOrdered; no shuffle, no global sort.
    assert "TakeOrderedAndProject" in plan
    assert _n_exchanges(plan) == 0


def _n_exchanges(plan: str) -> int:
    """Count Exchange operator NODES in a formatted plan (formatted
    mode prints '(n) Exchange' in the detail section; the string
    'Exchange hashpartitioning' only exists in simple mode)."""
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_time_window_rollup_single_shuffle(spark):
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_time_window_rollup,
    )

    plan = _plan(q_time_window_rollup(spark, SF))
    # Partial agg map-side, ONE exchange on the grouping key, final agg.
    assert _n_exchanges(plan) == 1
    assert "HashAggregate" in plan


def test_grouping_sets_single_expand_single_shuffle(spark):
    from datapoints_csv_extractor_spark.operators.analytic import q_grouping_sets

    plan = _plan(q_grouping_sets(spark, SF))
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
    assert _n_exchanges(plan) == 1


def test_datapoints_sink_partition_pruning(spark, tmp_path):
    """The date-partitioned sink must prune directories for time-range
    scans (PartitionFilters on dt, not a full-table scan) — the 100 TB
    payoff of the layout chosen in sinks/datapoints.py."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.sinks.datapoints import write_datapoints

    day_ms = 86_400_000
    rows = [
        ("s1", "n", 1_550_092_560_000 + d * day_ms, 1.0, "f", 0)
        for d in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "external_id string, name string, ts_ms long, value double, "
        "source_file string, file_ts long",
    )
    write_datapoints(df, str(tmp_path / "dp"))

    scan = spark.read.parquet(str(tmp_path / "dp")).where(
        F.col("dt") == "2019-02-14"
    )
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "dt" in plan
    assert scan.count() == 1


def test_asof_join_single_shuffle(spark):
    """The union+window as-of strategy must cost exactly ONE exchange
    (per-user sort), not the two-shuffles-plus-join of the naive
    formulation."""
    plan = _plan(R.q_asof_join(spark, SF))
    assert _n_exchanges(plan) == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_fuzzy_match_levenshtein_is_guarded_by_length_band(spark):
    """The length-band guard must wrap the levenshtein in a CASE (per-row
    short-circuit): Catalyst merges plain filter conjuncts into the join
    condition in arbitrary order, which once put the O(len^2) DP ahead
    of the integer length check."""
    plan = _plan(R.q_fuzzy_match(spark, SF))
    m = re.search(r"CASE WHEN.*?END", plan)
    assert m, f"no CASE guard in join condition: {plan[:2000]}"
    guard = m.group(0)
    assert "abs(" in guard.split("levenshtein")[0], (
        "length check must precede levenshtein inside the guard"
    )


def test_ngram_jaccard_hot_shingle_cap_is_broadcast_anti_join(spark):
    """The stop-shingle df cap must anti-join against a BROADCAST hot
    list (tiny by construction), never a shuffled one. The guard
    targets _hot_dropped_shingles — the shared shingle source of both
    Jaccard pair generators — directly, because ngram_jaccard_pairs
    materializes its postings fold with an eager localCheckpoint, so
    the anti-join no longer appears in the final query's lazy plan."""
    from datapoints_csv_extractor_spark.operators import dedup as D
    from datapoints_csv_extractor_spark.operators.relational import load

    plan = _plan(
        D._hot_dropped_shingles(
            load(spark, SF, "documents"), D.STOP_SHINGLE_MAX_DF, 3
        )
    )
    anti = [
        ln
        for ln in plan.splitlines()
        if "LeftAnti" in ln and ("HashJoin" in ln or "SortMergeJoin" in ln)
    ]
    assert anti, "expected a left-anti join for the hot-shingle cap"
    assert all("Broadcast" in ln for ln in anti), anti


def test_no_cartesian_product_in_any_registered_query(spark):
    """Sweeping scale guard: no queries() entry may plan a
    CartesianProduct, and a BroadcastNestedLoopJoin is allowed only
    where the build side is parameter-sized by construction — every
    other join must have an equi-condition (blocked/bucketed), or the
    operator is O(n^2) at corpus scale."""
    import __spark_entry__ as E

    # NLJ against a broadcast side that never grows with the data:
    NLJ_PARAM_SIZED_BUILD = {
        "q_range_join",       # generated weekly calendar (O(weeks) rows)
        "q_scalar_subquery",  # 1-row scalar aggregate
        "q_vocab_coverage",   # 1-row x 1-row singleton-aggregate cross join
        "q_bigram_lift",      # 1-row x 1-row corpus-total aggregates broadcast
        "q_tfidf_top_terms",  # 1-row doc-count aggregate broadcast
        "q_unigram_logprob",  # 1-row token-total aggregate broadcast
        "q_knn_multi",        # n_queries-row probe set broadcast
        "q_semantic_decontamination",  # eval-suite side broadcast (small, fixed)
        "q_hard_negative_mine",  # anchor probe-set broadcast (decontamination shape)
        "q_als_recommend",    # probe-user factor rows broadcast (knn_multi shape)
        "q_hits_pages",       # 1-row L2-norm aggregate broadcast per renorm
        "q_record_linkage_fs",  # 1-row u-rate aggregate broadcast
        "q_retrieval_metrics",  # n_queries-row probe set broadcast (knn_multi shape)
        "q_embedding_truncation_recall",  # n_queries-row probe set broadcast
        "q_source_mixture",   # 1-row token-total aggregate broadcast
        "q22_idle_rich_customers",  # 1-row avg-balance scalar broadcast
        "q11_important_parts",  # 1-row avg-part-value scalar broadcast
        "q_audience_overlap_hll",  # types-row sketch table x itself
        "q_kmv_overlap",  # types-row KMV sketch table x itself
        "q_dsir_importance_sample",  # 1-row gram-total aggregate broadcast
        "q_rfm_segments",  # 1-row max-orderdate anchor broadcast
        "q_join_size_estimate",  # 1-row max-product scalar broadcast
        "q_triangle_count",  # 1-row census aggregates cross-assembled
        "q_sax_words",  # 1-row global day-bounds aggregate broadcast
        "q_sax_motifs",  # same 1-row day-bounds broadcast
        "q_dtw_knn",  # same 1-row day-bounds broadcast (series + letters)
        "q_lpa_modularity",  # 1-row total-edge aggregate broadcast
        "q_t_closeness",  # band-dimension grid + 1-row (N, B) broadcast
        "q_kaplan_meier",  # 1-row subject-total / max-date broadcasts
        "q_isotonic_calibration",  # B<=20 bin-table minimax triples
        "q_negative_sampling",  # 1-row total-weight aggregate broadcast
        "q_benford_totalprice",  # 1-row digit-total aggregate broadcast
        "q_hbos_outliers",  # 1-row min/max/total + 1-row p99 broadcasts
        "q_stratified_ate",  # 1-row grand-total aggregate broadcast
        "q_conformal_interval",  # 1-row calib-quantile broadcast
        "q_mde_power",  # 1-row grand-total aggregate broadcast
        "q_chi2_independence",  # r x c marginal grid + 1-row totals
        "q_calibration_error",  # 1-row bin-total aggregate broadcast
        "q_source_jsd",  # sources x top-300 head-vocab grid broadcast
        "q_packing_efficiency",  # 4-row context-candidate broadcast
        "q_colbert_maxsim",  # bounded query-token probe-set broadcast
        "q_dsir_ess",  # 1-row max-log-weight + gram-total broadcasts
        "q_source_concentration",  # 1-row Gini-total aggregate broadcast
        "q_logrank_test",  # 1-row max-date / arm-total broadcasts
        "q_cuped",  # 1-row pooled-moment aggregate broadcast
        "q_heaps_law",  # 1-row max-doc-id aggregate broadcast
        "q_filter_kappa",  # 1-row 2x2-confusion aggregate fold
        "q_bradley_terry",  # item-dimension strength table broadcasts
        "q_kendall_tau",  # <=441-cell contingency grid x itself + 1-row folds
        "q_mutual_information",  # 1-row MI/entropy aggregate assembly
        "q_gumbel_block_maxima",  # 1-row block-moment aggregate fold
        "q_effect_sizes",  # 1-row moment + rank-sum aggregate fold
        "q_wasserstein_1d",  # sources x length-grid completion (dimension-sized)
        "q_permutation_test",  # 1-row T_obs + 1-row extreme-count broadcasts
        "q_log_odds_dirichlet",  # 1-row corpus-total aggregate broadcast
        "q_token_burstiness",  # 1-row doc-count aggregate broadcast
    }

    offenders = {}
    for name, fn in E.queries().items():
        plan = _plan(fn(spark, SF))
        bad = [
            ln.strip()
            for ln in plan.splitlines()
            if "CartesianProduct" in ln
            or (
                "BroadcastNestedLoopJoin" in ln
                and name not in NLJ_PARAM_SIZED_BUILD
            )
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"quadratic join shapes: {offenders}"


def test_pii_redact_is_map_only_with_pruned_scan(spark):
    """PII detect+redact must stay a single map stage: no Exchange
    anywhere, and the scan reads only (doc_id, text)."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_pii_redact(spark, SF))
    assert "Exchange" not in plan
    m = re.search(r"ReadSchema: (.+)", plan)
    assert m and "doc_id" in m.group(1) and "text" in m.group(1)
    assert "lang" not in m.group(1) and "source" not in m.group(1)


def test_quality_classifier_is_map_only(spark):
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_quality_classifier(spark, SF))
    assert "Exchange" not in plan


def test_mixture_resample_is_map_only(spark):
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_mixture_resample(spark, SF))
    assert "Exchange" not in plan


def test_repeated_spans_has_no_pair_explosion(spark):
    """Repeated-span detection is the decontamination shape: gram
    aggregate + equijoin. There must be NO join keyed on doc pairs
    (no quadratic candidate work), only gram-keyed exchanges."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_repeated_spans(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_export_shards_single_aggregation_shuffle(spark):
    """Shard manifest = one hash-partitioned aggregate over 16 keys;
    partial aggregation must appear before the exchange."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_export_shards(spark, SF))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan  # agg + final orderBy range exchange
    assert "HashAggregate" in plan


def test_q14_broadcasts_part_and_pushes_date_filter(spark):
    plan = _plan(R.q14_promo_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(r"PushedFilters:.*l_shipdate", plan)


def test_q19_disjunction_stays_out_of_the_join_condition(spark):
    """The OR-of-ANDs must be a post-join filter over the broadcast
    hash join on partkey, never a nested-loop join condition."""
    plan = _plan(R.q19_disjunctive_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q22_scalar_subquery_and_anti_join_broadcast(spark):
    plan = _plan(R.q22_idle_rich_customers(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # The anti-join against orders must not sort-merge at this scale.
    assert "SortMergeJoin" not in plan


def test_line_dedup_is_aggregate_not_window(spark):
    """The first-occurrence pick must be a partially-aggregated
    min(struct), never a row_number window: partial aggregation is
    what collapses a hot repeated line map-side before the shuffle."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_line_dedup(spark, SF))
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_interpolation_single_shuffle_like_asof(spark):
    """Linear interpolation must keep the union+window shape: ONE
    exchange (the per-user sort), never a grid-to-events range join."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_interpolate_linear,
    )

    plan = _plan(q_interpolate_linear(spark, SF))
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    # Union + distinct-users subtree adds an exchange for the distinct;
    # the window itself must contribute exactly one more.
    assert _n_exchanges(plan) <= 2, plan[:1500]


def test_lttb_series_shuffle_is_exempt_from_aqe_coalescing(spark):
    # AQE prices shuffle BYTES, so the 100k-row series shuffle would
    # coalesce to one task and serialize the whole Arrow stage behind
    # a single Python worker (measured 5.2 s -> 0.9 s at sf0.1). The
    # pin is an explicit repartition-by-num, the one shuffle origin
    # AQE's coalescer must leave alone; losing it is a silent 32x
    # parallelism regression that no correctness test would catch.
    from datapoints_csv_extractor_spark.operators.analytic import q_lttb_downsample

    plan = _plan(q_lttb_downsample(spark, SF))
    assert "REPARTITION_BY_NUM" in plan
    m = re.search(r"hashpartitioning\(user_id[^,]*, (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) >= spark.sparkContext.defaultParallelism


def test_spread_scan_is_a_noop_once_the_scan_is_parallel(spark):
    # The scale contract: spread_scan exists for the one-split local
    # corpus; a scan already at >= cluster parallelism must pass
    # through UNCHANGED (no round-robin exchange — at 100 TB that
    # branch would reshuffle the whole corpus for nothing).
    from datapoints_csv_extractor_spark.operators.skew import spread_scan

    docs = load(spark, SF, "documents")
    assert "RoundRobinPartitioning" in _plan(spread_scan(docs))  # 1 split: fires
    wide = docs.repartition(64)
    assert spread_scan(wide) is wide  # already parallel: identity
    assert spread_scan(docs, already_parallel=True) is docs  # explicit hint

    # The probe must stay metadata-only: an eager plan-to-RDD
    # conversion per call would defeat lazy composition in
    # foreachBatch loops (round-4 verdict item).
    import inspect

    from datapoints_csv_extractor_spark.operators import skew

    assert ".rdd" not in inspect.getsource(skew)


def test_time_weighted_aggregates_two_data_shuffles(spark):
    """Segment window (user key) + bucket groupBy are the only data
    shuffles; the day-bucket clipping must run as a Generate (explode)
    with NO range join, and the aggregation must have a map-side
    partial below its exchange."""
    from datapoints_csv_extractor_spark.operators import analytic as A

    plan = _plan(A.q_time_weighted_aggregates(spark, SF))
    assert "Join" not in plan  # no grid/range join anywhere
    assert "Generate" in plan
    assert "partial_sum" in plan
    # window exchange + agg exchange + presentation orderBy only
    assert _n_exchanges(plan) <= 3
    assert "Python" not in plan


def test_funnel_single_aggregation_shuffle(spark):
    """The funnel state machine must be ONE collect_list aggregation
    (map-side partial + one hash exchange) — never the per-stage join
    cascade of the SQL formulation."""
    from datapoints_csv_extractor_spark.operators import analytic as A

    plan = _plan(A.q_funnel_stages(spark, SF))
    assert "Join" not in plan
    assert "partial_collect_list" in plan
    assert _n_exchanges(plan) <= 2  # agg + presentation orderBy
    assert "Python" not in plan


def test_pq_adc_query_path_is_jvm_only(spark, tmp_path):
    """The PQ serving scan must contain no Python stage (ADC is
    element_at lookups into a literal) and no training job: the plan
    over the stored codes is scan -> project -> TakeOrdered."""
    from datapoints_csv_extractor_spark.operators import similarity as V

    e = load(spark, SF, "embeddings")
    idx = str(tmp_path / "pq")
    V.build_pq_index(e, idx, n_iters=1)
    qvec = [float(x) for x in e.select("embedding").first()[0]]
    df = V.ann_pq_topk_from_index(spark, idx, qvec, k=5)
    plan = _plan(df)
    assert "Python" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_asof_nearest_single_data_shuffle(spark):
    """The nearest-direction as-of must keep the union+window shape:
    one data exchange (per-user sort) + the presentation orderBy —
    never a click-to-purchase join."""
    plan = _plan(R.q_asof_nearest(spark, SF))
    assert "Join" not in plan
    assert _n_exchanges(plan) <= 2


def test_upsert_merge_partial_aggregates_before_exchange(spark):
    """The CDC merge's scale property: NO row_number window, and the
    history is reduced map-side — a partial_max_by aggregate feeds
    the exchange, so the shuffle carries one candidate per
    (partition, key) instead of the full change-log (struct-valued
    max_by compiles to SortAggregate; the partial marker is what
    proves the map-side combine)."""
    plan = _plan(R.q_upsert_merge(spark, SF))
    assert "Window" not in plan
    assert "partial_max_by" in plan
    # the exchange input is the 4-column aggregated form (key cols +
    # the max_by combiner pair), not the 7-column raw log
    m = re.search(r"\(\d+\) Exchange\nInput \[(\d+)\]", plan)
    assert m and int(m.group(1)) == 4


def test_topk_ngrams_windows_over_counted_table_only(spark):
    """Grouped heavy-hitters: the row_number window must consume the
    COUNTED (source, trigram) aggregate, not raw exploded grams — the
    plan shows Generate (explode) strictly below the HashAggregates,
    and the Window strictly above them."""
    from datapoints_csv_extractor_spark.operators.textops import (
        q_topk_ngrams_per_source,
    )

    plan = _plan(q_topk_ngrams_per_source(spark, SF))
    body = plan.split("== Physical Plan ==")[-1]
    gen = body.find("Generate")
    win = body.find("Window")
    agg = body.find("HashAggregate")
    assert gen != -1 and win != -1 and agg != -1
    assert win < agg < gen  # formatted plans print top-down


def test_bm25_search_filters_terms_before_aggregate(spark):
    """BM25 live scan: the query-term filter must sit BELOW the tf
    aggregate (between explode and groupBy), so the shuffle carries
    only matching-term rows."""
    from datapoints_csv_extractor_spark.operators.textops import bm25_topk
    from datapoints_csv_extractor_spark.operators.relational import load as _l

    plan = _plan(bm25_topk(_l(spark, SF, "documents"), ["dup", "window"], k=5))
    body = plan.split("== Physical Plan ==")[-1]
    agg = body.find("HashAggregate")
    filt = body.find("array_contains")
    assert agg != -1 and filt != -1
    assert filt > agg  # filter deeper than (printed after) the agg


def test_quantile_sketch_single_window_over_sketch(spark):
    """The sketch rollup's window runs over the merged sketch (bins),
    never the raw events: Window above both HashAggregates."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_quantile_sketch_rollup,
    )

    plan = _plan(q_quantile_sketch_rollup(spark, SF))
    body = plan.split("== Physical Plan ==")[-1]
    win = body.find("Window")
    aggs = [m.start() for m in re.finditer("HashAggregate", body)]
    assert win != -1 and aggs
    assert all(win < a for a in aggs[-2:])  # daily+monthly aggs below


def test_tombstone_free_store_reads_add_no_join(spark, tmp_path):
    """With no committed deletes, store_tombstones returns None and
    the IVF read path's plan carries NO anti-join — the tombstone
    capability must be free until it's used."""
    import random

    from datapoints_csv_extractor_spark.operators.similarity import (
        build_ivf_index,
        read_ivf_assignments,
    )

    rng = random.Random(5)
    e = spark.createDataFrame(
        [
            (i, 0, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(30)
        ],
        "vec_id long, label int, embedding array<double>",
    )
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(e, index_dir, n_centroids=2)
    plan = _plan(read_ivf_assignments(spark, index_dir))
    assert "Join" not in plan, "no deletes -> no anti-join in the plan"


def test_ivf_query_keeps_cell_pruning_with_tombstones(spark, tmp_path):
    """Tombstone filtering must not break the 100 TB win: the probe
    query still prunes to its cells at file-listing time (the cell
    partition filter survives the added anti-join)."""
    import random

    from datapoints_csv_extractor_spark.operators.dedup import (
        delete_from_store,
    )
    from datapoints_csv_extractor_spark.operators.similarity import (
        ann_ivf_topk_from_index,
        build_ivf_index,
    )

    rng = random.Random(5)
    vecs = [
        (i, 0, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    e = spark.createDataFrame(
        vecs, "vec_id long, label int, embedding array<double>"
    )
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(e, index_dir, n_centroids=4)
    delete_from_store(
        spark, index_dir, [1, 2], delete_id="d", id_col="vec_id"
    )
    q = ann_ivf_topk_from_index(
        spark, index_dir, vecs[0][2], k=5, n_probe=1
    )
    plan = _plan(q)
    assert "PartitionFilters" in plan and "cell" in plan
    assert "LeftAnti" in plan or "left_anti" in plan.lower()
    assert {r.vec_id for r in q.collect()}.isdisjoint({1, 2})


def test_bloom_decontamination_probe_is_map_only(spark):
    """The Bloom probe's RETURNED plan must scan only (doc_id, text)
    and contain no DATA shuffle — no hash/range exchange, i.e. no
    join or aggregation: the bitset rides in as a literal, so the
    training corpus is filtered in place (the whole point of the
    Bloom tier vs the exact gram equijoin). A ROUND-ROBIN spread of
    the scan is permitted: it fans a single-split corpus out to the
    executors before the per-row md5 probe chain (a no-op at real
    scale where splits >> cores) and does not move data toward any
    key — filter-in-place semantics are unchanged."""
    from datapoints_csv_extractor_spark.operators import dedup as D

    plan = _plan(D.q_bloom_decontamination(spark, SF))
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    m = re.search(r"ReadSchema: (.+)", plan)
    assert m and "doc_id" in m.group(1) and "text" in m.group(1)


def test_dsir_ratio_join_is_broadcast(spark):
    """DSIR's per-doc scoring joins the parameter-sized (<= 4096-row)
    bucket-ratio table — that join must be a BroadcastHashJoin, never
    a shuffled join of the exploded bigram stream against it."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_dsir_importance_sample(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_global_shuffle_single_hash_exchange(spark):
    """The seeded shuffle must cost exactly one hash-partition
    exchange (the shard window) — no range exchange / global sort."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_global_shuffle(spark, SF))
    assert _n_exchanges(plan) == 1
    assert "rangepartitioning" not in plan.lower()


def test_mixture_plan_single_aggregation_shuffle(spark):
    """The mixture plan costs one aggregation over the corpus; the
    weight table joins broadcast."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_mixture_plan(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_interval_overlap_join_is_binned_equijoin(spark):
    """The keyless overlap join must plan as an EQUIJOIN on bucket id
    (SortMergeJoin/ShuffledHashJoin) — never a BroadcastNestedLoop
    over the raw theta condition — and must find pairs that only
    share a bucket via spanning (the dedup + boundary semantics)."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        interval_overlap_join,
    )

    L = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", "2024-01-01 07:50:00"),   # spans 4 buckets
         (2, "2024-01-01 01:00:00", "2024-01-01 01:05:00"),
         (3, "2024-01-02 00:00:00", "2024-01-02 00:30:00")],  # overlaps nothing
        "lid long, ls string, le string",
    ).select("lid", F.col("ls").cast("timestamp"), F.col("le").cast("timestamp"))
    R = spark.createDataFrame(
        [(10, "2024-01-01 01:30:00", "2024-01-01 06:00:00"),  # hits lid 1 only
         (20, "2024-01-01 00:00:00", "2024-01-01 01:02:00")], # hits lids 1, 2
        "rid long, rs string, re string",
    ).select("rid", F.col("rs").cast("timestamp"), F.col("re").cast("timestamp"))
    out = interval_overlap_join(L, R, ("ls", "le"), ("rs", "re"))
    pairs = {(r.lid, r.rid) for r in out.collect()}
    assert pairs == {(1, 10), (1, 20), (2, 20)}
    # Multi-bucket co-span produces ONE row per pair (distinct folds
    # the bucket multiplicity).
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_join_size_report_matches_executed_join(spark):
    """The pre-flight cardinality must equal the executed join's count
    and finger the worst key, without ever materializing the join."""
    from datapoints_csv_extractor_spark.operators.relational import (
        join_size_report,
    )

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (3,), (3,)], "ka long"
    )
    b = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (9,)], "kb long"
    )
    row = join_size_report(a, b, "ka", "kb").collect()[0]
    assert row.join_rows == a.join(b, a.ka == b.kb).count() == 10
    assert row.n_join_keys == 3
    assert row.max_key_rows == 6 and row.top_key == 3  # 3 x 2
    assert row.skew_ratio == 6 / (10 / 3)


def test_tebis_ingest_measured_shuffle_is_zero_bytes(spark, tmp_path):
    """Stronger than the plan-string pin above: after actually running
    the ingest, the executed plan's SQLMetrics must show ZERO shuffle
    bytes written and zero spill — the measured no-shuffle claim."""
    from datapoints_csv_extractor_spark.plans.introspect import (
        executed_plan_metrics,
        metrics_summary,
    )
    from datapoints_csv_extractor_spark.sources.tebis_csv import read_datapoints
    from fixtures import write_tebis_csv

    folder = tmp_path / "in"
    folder.mkdir()
    p1 = write_tebis_csv(folder, file_ts=1550092560, n_series=3, n_rows=10, seed=1)
    p2 = write_tebis_csv(folder, file_ts=1550092620, n_series=5, n_rows=10, seed=2)
    df = read_datapoints(spark, [p1, p2])
    n = df.count()
    assert n == 80
    # count() executes an aggregate DERIVED from df; run df itself so
    # its own executed plan carries metrics.
    df.collect()
    s = metrics_summary(df)
    assert s["shuffle_bytes_written"] == 0
    assert s["spill_bytes"] == 0
    assert s["max_operator_rows"] >= 80
    # And the walk sees real per-node metrics (not an empty traversal).
    assert any(
        r["metric"] == "number of output rows" and r["value"] == 80
        for r in executed_plan_metrics(df)
    )


def test_global_rank_is_exact_and_distributed(spark):
    """global_rank must equal the single-window row_number under the
    same total order while planning NO no-partition window (the
    single-task trap), and sorted_neighborhood_pairs must produce
    exactly the |rank diff| <= w pair set via a bucket equijoin."""
    from datapoints_csv_extractor_spark.operators.relational import (
        global_rank,
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"name_{i % 7}_{i}") for i in range(100)], "id long, nm string"
    )
    got = {
        r.id: r.rank
        for r in global_rank(df, ["nm", "id"], n_parts=8).collect()
    }
    from pyspark.sql import Window

    truth = {
        r.id: r.r - 1
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("nm", "id")).alias("r")
        ).collect()
    }
    assert got == truth
    # Pair set: every 0 < rank_b - rank_a <= 3 pair, nothing else.
    pairs = {
        (r.a_id, r.b_id)
        for r in sorted_neighborhood_pairs(df, ["nm", "id"], window=3,
                                           n_parts=8).collect()
    }
    inv = {v: k for k, v in truth.items()}
    expect = {
        (inv[r], inv[r + d])
        for r in range(100)
        for d in (1, 2, 3)
        if r + d < 100
    }
    assert pairs == expect


def test_interval_overlap_join_auto_bucket(spark):
    """bucket_seconds=None derives the dial from the median interval
    length and must produce the identical pair set."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        interval_overlap_join,
    )

    L = spark.createDataFrame(
        [(i, f"2024-01-01 0{i}:00:00", f"2024-01-01 0{i}:45:00")
         for i in range(1, 6)],
        "lid long, ls string, le string",
    ).select("lid", F.col("ls").cast("timestamp"), F.col("le").cast("timestamp"))
    R2 = spark.createDataFrame(
        [(10, "2024-01-01 01:30:00", "2024-01-01 03:10:00")],
        "rid long, rs string, re string",
    ).select("rid", F.col("rs").cast("timestamp"), F.col("re").cast("timestamp"))
    fixed = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            L, R2, ("ls", "le"), ("rs", "re"), bucket_seconds=600
        ).collect()
    }
    auto = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            L, R2, ("ls", "le"), ("rs", "re"), bucket_seconds=None
        ).collect()
    }
    assert auto == fixed == {(1, 10), (2, 10), (3, 10)}


def test_stratified_sample_pushes_window_group_limit(spark):
    """stratified_sample_exact's rank filter must compile to
    WindowGroupLimit (partial map-side top-n BEFORE the stratum
    exchange) — the property that keeps a skewed stratum from
    funneling through one sort — and the sample must be exact-count
    and deterministic."""
    from datapoints_csv_extractor_spark.operators.curation import (
        stratified_sample_exact,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
    )
    out = stratified_sample_exact(df, "src", 7, id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]

    rows = out.collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r.doc_id)
    assert {len(v) for v in by_src.values()} == {7}
    again = {tuple(sorted(v)) for v in by_src.values()}
    rows2 = stratified_sample_exact(df, "src", 7, id_col="doc_id").collect()
    by_src2: dict = {}
    for r in rows2:
        by_src2.setdefault(r.src, []).append(r.doc_id)
    assert {tuple(sorted(v)) for v in by_src2.values()} == again

    # Strata smaller than n keep every row.
    tiny = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, src string"
    )
    assert stratified_sample_exact(tiny, "src", 5).count() == 3


def test_robots_filter_rule_joins_broadcast(spark):
    """The robots gate's rule-side joins (group choice + candidate
    match) must broadcast — rules are dimension-sized by
    construction, and a sort-merge join against the URL frame would
    shuffle the whole crawl on domain."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_robots_filter(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_domain_quality_verdict_join_never_sort_merges(spark):
    """q_domain_quality joins two derivations of the SAME documents
    scan on doc_id; at this size the planner must broadcast one side
    rather than shuffle both."""
    from datapoints_csv_extractor_spark.operators import curation as C

    plan = _plan(C.q_domain_quality(spark, SF))
    assert "SortMergeJoin" not in plan


def test_pca_projection_measured_shuffle_is_zero_bytes(spark):
    """PCA serving inlines the component matrix as literals — the
    projection must be a map-only scan: zero shuffle bytes, zero
    spill, measured on the executed plan."""
    from datapoints_csv_extractor_spark.operators import similarity as V
    from datapoints_csv_extractor_spark.plans.introspect import (
        metrics_summary,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = V.pca_train(e, "embedding", k=2)
    proj = V.pca_project(e.select("vec_id", "embedding"), model).drop(
        "embedding"
    )
    assert proj.collect()
    s = metrics_summary(proj)
    assert s["shuffle_bytes_written"] == 0
    assert s["spill_bytes"] == 0


def test_round10_coda_scans_are_pruned_and_single_pass(spark):
    """The round-10 coda's corpus folds must (a) prune the scan to
    the columns they use — an events scan reading props/event_id for
    a 3-column fold is wrong at 100 TB — and (b) for
    q_retention_cohorts, touch the events parquet ONCE (the cohort
    table derives from the distinct activity set, not a second
    scan)."""
    from datapoints_csv_extractor_spark.operators import analytic as A
    from datapoints_csv_extractor_spark.operators import textops as X

    def read_schemas(plan: str) -> list[str]:
        return re.findall(r"ReadSchema: (.+)", plan)

    cases = [
        (A.q_ols_normal_equations, {"user_id", "event_type", "value"}),
        (A.q_kendall_tau, {"user_id", "event_type", "value"}),
        (A.q_effect_sizes, {"event_type", "value"}),
        (A.q_mutual_information, {"event_type", "value"}),
        (A.q_gumbel_block_maxima, {"ts", "value"}),
        (A.q_burstiness_fano, {"event_type", "ts"}),
        (X.q_simpson_diversity, {"source", "text"}),
    ]
    for fn, want in cases:
        plan = _plan(fn(spark, SF))
        schemas = read_schemas(plan)
        assert schemas, f"{fn.__name__}: no parquet scan found"
        for s in schemas:
            got = set(re.findall(r"(\w+):", s))
            assert got <= want, (
                f"{fn.__name__} scan reads {got - want} beyond {want}: {s}"
            )

    # Retention: the corpus folds ONCE into the localCheckpointed
    # distinct activity set — the downstream plan must carry zero
    # parquet scans, and the materialized intermediate exactly the
    # two narrow columns (scan hygiene happens BEFORE materializing).
    df = A.q_retention_cohorts(spark, SF)
    plan = _plan(df)
    assert "Scan parquet" not in plan, (
        "retention rescans the corpus past the checkpoint"
    )
    rdd_schemas = re.findall(
        r"Scan ExistingRDD\S*\s*\nOutput \[\d+\]: \[(.+?)\]", plan
    )
    assert rdd_schemas, plan[:500]
    cols = set(re.findall(r"(\w+)#", rdd_schemas[0]))
    assert cols == {"user_id", "active_week"}, cols
