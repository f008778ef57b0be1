"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped pricing summary at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator slug from SURVEY.md §2 (registered in
``resotodatalink_spark.registry`` by the ``queries/`` modules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark import registry

registry.load_all()

# The driver's correctness sweep attests the FIRST 50 dict entries only
# (CORRECTNESS_r01/r02 each stop at exactly 50).  Policy (per round-2
# ADVICE): slugs whose implementation or oracle CHANGED this round are
# always inside the window, followed by the slugs with the stalest
# attestation (no row in the previous round's CORRECTNESS file).  Slugs
# with a fresh green row from last round and no changes this round are
# the ones that may fall past the cap.  All slugs stay registered.
_NEVER_ATTESTED = [
    # Round-11 newcomers (registry grows 194 -> 200): the iterative /
    # sketch / span-merge / diversity gaps in the LLM-pipeline family,
    # each value-hash-oracled.  Never attested, so they lead the window
    # (the 6 slots push 6 more r7-tier slugs into _R12_COHORT, which
    # still fits r12's 50 with room to spare — see arithmetic below).
    "ann_pq_adc",
    "bpe_encode_corpus",
    "bpe_train_merges",
    "dup_span_merge",
    "hll_estimate_vs_exact",
    "mmr_diversify",
    # Second-wave round-11 newcomers (registry 200 -> 206): positional
    # phrase search, DSIR importance resampling, sampled-quantile and
    # JL-projection and kNN-label audits, HLL register mergeability.
    # Never attested, so they join the window head; the 6 extra slots
    # push 6 more r7-tier slugs into _R12_COHORT (arithmetic below).
    "dsir_importance_weights",
    "hll_merge_by_source",
    "jl_projection_audit",
    "knn_label_agreement",
    "phrase_search",
    "quantile_sample_audit",
    # Third-wave round-11 newcomers (registry 206 -> 210): KMV set
    # algebra (cross-source overlap estimation), temperature-scaled
    # mixture sampling, the l-diversity privacy gate, and scene-cut
    # detection over the demuxed frame stream.
    "kmv_set_ops",
    "l_diversity_audit",
    "multimodal_scene_cuts",
    "temperature_mixture",
    # …plus the bipartite co-engagement projection with its hub cap
    # (registry 210 -> 211).
    "coengagement_pairs",
    # Fourth-wave round-11 newcomers (registry 211 -> 215): the
    # Pareto-frontier (skyline) operator via distributed
    # frontier-of-frontiers, the exact two-sample KS drift statistic
    # beside PSI, t-closeness completing the privacy-gate trio, and
    # the sharded heavy-hitter recall audit.  Exactly 4 so the window
    # arithmetic closes: 21 new + 8 seam + 7 changed + 14 r6 = 50,
    # meaning zero r7-tier slots this round and ALL 43 r7-tier slugs
    # spill to _R12_COHORT (43 <= 50, still fits with room to spare,
    # and the "no slug older than r7 after r11" invariant holds).
    "heavy_hitters_audit",
    "ks_drift_audit",
    "pareto_frontier",
    "t_closeness_audit",
]

_R10_SEAM_CHANGED = [
    # r10 verdict item 1 (the round's TOP priority): these 8 got the
    # mechanical checkpoint-seam rewire (localCheckpoint ->
    # operators/checkpoint.ckpt, production-identical passthrough)
    # AFTER their last driver rows (r7-r9).  Changed-slug policy says
    # window-first, so they lead r11 unconditionally.
    "sparse_cosine_pairs",
    "semdedup",
    "ngram_collocations",
    "ann_recall_at_k",
    "zorder_pruning_audit",
    "bloom_prefilter_audit",
    "graph_triangle_count",
    "graph_kcore",
]

_CHANGED_THIS_ROUND = [
    # Round-11 changes (r10 verdict item 2 — the last stub codecs
    # retired): both slugs migrated onto REAL parsers with new
    # byte-arithmetic oracles, so both re-attest this round.
    # * multimodal_decode: stub arithmetic -> real P6 decode at
    #   width 16 (header-driven geometry, disjoint doc slice)
    # * multimodal_features: stub ascii-floats -> real RIFF/WAVE
    #   amplitude moments (min/max/abs-mean/zero-cross) via the new
    #   operators/multimodal.wav_features stage
    # * multimodal_frames: value-identical hygiene changes (the
    #   demuxer no longer yields EMPTY pandas frames for all-corrupt
    #   batches — they tripped a per-batch concat FutureWarning in the
    #   Arrow serializer — and rejects zero-area frames that would
    #   IndexError the batch); re-attested on the changed-slug
    #   principle
    # * multimodal_ppm_stats / multimodal_wav_stats /
    #   multimodal_ppm_resize: value-identical robustness guards in
    #   their shared parsers (zero-dim PPM headers -> null row instead
    #   of NaN means; zero-length WAV data chunks -> null row instead
    #   of ZeroDivisionError); re-attested on principle
    # * pandas_udaf_zscore: degenerate groups (1-row / constant) now
    #   emit NULL like the SQL oracle instead of pandas NaN — a latent
    #   hash divergence no shipped corpus group exposes (planted
    #   fixture attests all three group shapes on both engines)
    "multimodal_decode",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_ppm_stats",
    "multimodal_wav_stats",
    "multimodal_ppm_resize",
    "pandas_udaf_zscore",
]

_R6_TIER = [
    # Newest driver row is CORRECTNESS_r06 — the stalest tier (the 14
    # the r10 window could not hold); all inside the r11 window, so
    # after r11 no slug's newest row predates r7.
    "join_lateral",
    "median_stats",
    "pii_redaction",
    "pivot_table",
    "repetition_filter",
    "salted_groupby",
    "sessionize_events",
    "skew_join_salted",
    "string_agg",
    "tpch_q10_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "unpivot_stack",
    "window_range_frame",
]

_R7_TIER = [
    # Newest driver row is CORRECTNESS_r07 (semdedup and
    # sparse_cosine_pairs moved up into _R10_SEAM_CHANGED).  The first
    # 4 fill the r11 window's remaining slots; the tail spills to
    # _R12_COHORT below.
    "agg_bool_ops",
    "agg_filter_clause",
    "agg_sum_avg_min_max",
    "array_ops",
    "cdc_latest",
    "class_rebalance",
    "curation_pipeline",
    "date_functions",
    "dedup_levenshtein",
    "distinct_kmv_estimate",
    "doc_fingerprint",
    "frequent_terms",
    "funnel_conversion",
    "graph_pagerank",
    "graph_shortest_paths",
    "interval_overlap",
    "kmeans_lloyd",
    "lang_id",
    "ntile_deciles",
    "quality_score",
    "quota_sample",
    "retention_cohorts",
    "sample_hash_stratified",
    "scd2_intervals",
    "sequence_packing",
    "stream_dedup",
    "stream_distinct_users",
    "stream_interval_join",
    "stream_session_window",
    "stream_sliding_window",
    "stream_topk_windowed",
    "stream_tumbling_window",
    "subquery_scalar_correlated",
    "table_checksum",
    "text_chunking",
    "text_normalize",
    "tfidf_top_terms",
    "token_count",
    "tpch_q18_shape",
    "udtf_tokenize",
    "unigram_logprob",
    "window_first_last",
    "window_lag_lead",
]

# Fifth-wave round-11 newcomers (registry 215 -> 220).  The r11
# window is already exactly full (21+8+7+14 = 50, and displacing any
# r6-tier slug would break the no-slug-older-than-r7 invariant), so
# these five are placed at the HEAD of the r12 cohort instead of the
# window — the one deliberate deviation from newest-first ordering,
# traded for the staleness invariant.  They carry tri-SF local sweep
# + fixture + property-test evidence until the r12 driver row lands.
_R12_NEWCOMERS = [
    "benford_audit",
    "cusum_changepoint",
    "gazetteer_tagging",
    "kneser_ney_bigram",
    "rank_biased_overlap",
]

_ATTEST_FIRST = (
    _NEVER_ATTESTED
    + _R10_SEAM_CHANGED
    + _CHANGED_THIS_ROUND
    + _R6_TIER
    + _R12_NEWCOMERS
    + _R7_TIER
)

# The r12 cohort, named explicitly (capacity arithmetic continued from
# r10: a 220-slug registry attested 50/round floors at a ~4-round
# rotation).  r11's window holds 21 new + 8 seam + 7 changed + 14 r6
# = 50 exactly, so the spill is the 5 fifth-wave newcomers (cohort
# head) plus all 43 r7-tier slugs — after r11 the r7 tier are the
# ONLY slugs whose newest driver row is r7, and with zero r12 changes
# the 48 fit r12's window with 2 slots to spare, ending the staleness
# tail.
_R12_COHORT = _ATTEST_FIRST[50:]


def _ordered(mapping: dict) -> dict:
    rank = {name: i for i, name in enumerate(_ATTEST_FIRST)}
    names = sorted(
        mapping,
        key=lambda n: (rank.get(n, len(_ATTEST_FIRST)), list(mapping).index(n)),
    )
    return {n: mapping[n] for n in names}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["agg_sum_avg_min_max"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per slug (omitted entries get
    the driver's weaker rows-only check)."""
    return _ordered(dict(registry.ORACLES))
