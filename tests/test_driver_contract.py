"""Driver-contract meta-tests: __spark_entry__ stays self-consistent.

The DuckDB gate only checks queries it can see; these pin the contract
SHAPE so a future round can't silently drop an oracle or register a
broken callable.
"""

from __future__ import annotations

import inspect

import __spark_entry__ as E

# Operators whose Spark implementation has no DuckDB-expressible twin
# (xxhash64-based hashing, Arrow-batched Python decode). Anything else
# registered without an oracle is a contract regression.
ROWS_ONLY_ALLOWED = {
    "q_mojibake_repair",  # Python byte transcoding; round-trip pinned
    "q_mst_boruvka",  # Boruvka union-find; Kruskal-replica-pinned
    "q_zorder_pruning_report",  # file-skip counts of scratch writes
    "q_heavy_hitter_tokens",  # space-saving brackets are layout-dependent
    "q_image_near_dup",  # real PNG decode; no SQL twin
    "q_sssp_weighted",  # float min-plus relaxation; python-replica-pinned
    "q_minhash_signatures",
    "q_minhash_lsh_candidates",
    "q_simhash",
    "q_simhash_near_dup",
    "q_winnowing_fingerprints",
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_multimodal_decode",
    "q_image_features",   # real PNG pixel decode — no SQL engine has the codec
    "q_audio_features",   # real PCM sample decode — same
    "q_audio_near_dup",   # FFT landmark fingerprints — no SQL twin
    "q_audio_stream_meta",  # MPEG frame-header byte walk — no SQL twin
    "q_video_near_dup",   # animated-GIF frame decode — no SQL twin
    "q_thumbnail_match",  # GIF frame/still decode — no SQL twin
    "q_als_recommend",    # iterated least squares — no SQL twin
    "q_hits_pages",       # iterative float power iteration — no SQL twin
    "q_pca_project",      # driver-side eigh — no ANSI-SQL eigendecomposition
    "q_minhash_dedup_pipeline",
    "q_embedding_near_dup_lsh",
    "q_winnowing_near_dup",
    "q_multimodal_feature_knn",
    "q_curation_pipeline_full",
    "q_dedup_incremental",
    "q_dedup_incremental_deletes",  # same xxhash64 lineage + store fold
    "q_semantic_dedup",  # k-means assignment has no SQL twin
    "q_lttb_downsample",  # sequential per-series selection has no SQL twin
    "q_bpe_train_merges",  # iterative training state has no SQL twin
    "q_bpe_encode",  # same iterative-training lineage as bpe_train
    "q_semantic_dedup_incremental",  # k-means index lifecycle, no SQL twin
    "q_ann_pq_topk",  # k-means codebook training has no SQL twin
    "q_ann_pq_multi",  # same PQ training lineage
    "q_ann_ivfpq_topk",  # IVF + residual-PQ training lineage
    "q_ann_recall_report",  # measures the trained-index paths
    "q_hll_distinct_rollup",  # sketch estimates have no SQL twin
    "q_rolling_distinct_hll",  # same HLL sketch lineage, rolling form
    "q_compression_ratio",  # zlib has no SQL twin; Arrow map stage
    "q_audience_overlap_hll",  # HLL sketch arithmetic, no SQL twin
    "q_pagerank",  # iterative float ranks; numpy-parity-pinned in pytest
    "q_kcore",  # iterative peeling has no SQL twin; python-peeler-pinned
    "q_dtw_knn",  # banded-DTW dynamic program has no SQL twin; numpy-pinned
    "q_markov_attribution",  # absorbing-chain solve; replica-pinned
    "q_video_keyframes",  # GIF frame decode — no SQL twin
    "q_audio_segments",  # PCM decode + VAD framing — no SQL twin
}


def test_capture_window_is_fully_oracle_backed():
    """The driver hash-verifies the FIRST 50 queries() entries.
    Round 11 restored the 50/50 invariant (VERDICT r10 item 2: the
    two round-10 oracle-less rotations moved past slot 50); this pin
    makes any future oracle-less rotation into the window a red test
    instead of a silent `no_oracle` row in CORRECTNESS_r{N}."""
    window = list(E.queries())[:50]
    oracles = set(E.oracle_sql())
    missing = [q for q in window if q not in oracles]
    assert not missing, (
        f"capture-window entries without a DuckDB oracle: {missing}"
    )


def test_every_query_is_oracle_checked_or_whitelisted():
    qs = set(E.queries())
    oracles = set(E.oracle_sql())
    missing = qs - oracles - ROWS_ONLY_ALLOWED
    assert not missing, f"queries without oracle nor whitelist: {sorted(missing)}"


def test_no_orphan_oracles():
    orphans = set(E.oracle_sql()) - set(E.queries())
    assert not orphans, f"oracle_sql entries with no query: {sorted(orphans)}"


def test_query_callables_have_driver_signature():
    for name, fn in E.queries().items():
        params = list(inspect.signature(fn).parameters.values())
        assert len(params) >= 2, f"{name} must accept (spark, sf_dir)"
        # Any extra params must be defaulted (driver passes exactly two).
        for p in params[2:]:
            assert p.default is not inspect.Parameter.empty, (
                f"{name}: extra parameter {p.name} needs a default"
            )


def test_oracle_sql_mentions_no_spark_only_functions():
    for name, sql in E.oracle_sql().items():
        assert "xxhash64" not in sql.lower(), name
        assert "F." not in sql, name
