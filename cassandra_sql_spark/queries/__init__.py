"""The operator-inventory query catalog.

``REGISTRY`` maps query name -> Q(fn, oracle). ``__spark_entry__.py``
exposes it to the correctness driver; ``bench.py`` runs the headline subset.
"""

from __future__ import annotations

from cassandra_sql_spark.queries import (
    aggregates,
    analytics_r6c,
    behavior,
    expressions,
    joins,
    json_ops,
    modern_sql,
    modern_sql_r6,
    more_sql,
    pipeline_queries,
    pipeline_r6,
    r7_ops,
    r8_ops,
    r8b_ops,
    r9_ops,
    r9b_ops,
    r10_ops,
    r11_ops,
    r12_ops,
    relational,
    selection_queries,
    setops,
    streaming_queries,
    subqueries,
    temporal_queries,
    tpch,
    tpch_extra,
    windows,
)
from cassandra_sql_spark.queries.base import Q

_MODULES = (
    tpch,
    tpch_extra,
    relational,
    joins,
    aggregates,
    windows,
    setops,
    subqueries,
    expressions,
    json_ops,
    modern_sql,
    modern_sql_r6,
    more_sql,
    pipeline_queries,
    selection_queries,
    streaming_queries,
    temporal_queries,
    behavior,
    pipeline_r6,
    analytics_r6c,
    r7_ops,
    r8_ops,
    r8b_ops,
    r9_ops,
    r9b_ops,
    r10_ops,
    r11_ops,
    r12_ops,
)

# The correctness driver grades only the FIRST 50 registry entries. The
# window ROTATES per round so every oracle-checked entry eventually gets a
# hard-signal driver row (r1-r11 graded 358 distinct oracle-checked
# entries, all green at latest grading; see CORRECTNESS_r*.json).
# Round-12 window = the 6 round-11 additions staged in the r11
# NEXT_WINDOW (never driver-graded; all passed the judge's
# driver-faithful replay), the 4 rewrite canaries (entries whose PLAN or
# OUTPUT REPRESENTATION changed in r11/r12 — the r11 verdict widened the
# canary rule to plan-changing rewrites after dsir_importance's
# sharded_rank switch rotated past ungraded), the 14-entry remainder of
# the r4-graded cohort (closing it), and the alphabetically-first 26 of
# the next-oldest (r5-graded) cohort; 18 r5 entries remain for r13.
# ``tests/test_registry.py`` pins this composition and caps the
# never-graded tail at one window's capacity.
PRIORITY: tuple[str, ...] = (
    # round-11 additions, never driver-graded, in landing order
    "jpeg_progressive_decode_real",  # REAL progressive JPEG (codec #7)
    "event_activity_gini",  # user-activity Lorenz via sharded_rank
    "stat_page_trend",      # ordered-alternative companion to Friedman
    "event_pingpong_rate",  # A->B->A bounce share, path-quality filter
    "gif_animated_frame_sample",  # REAL animated GIF (codec #8) + stride
    "emb_cosine_pair_histogram",  # representation-collapse diagnostic
    # rewrite canaries (plan or output representation changed r11/r12;
    # all driver rows predate the rewrite — regrade what changed):
    "dsir_importance",       # r11 sharded_rank switch + r12 one-pass cut
    "emb_quantize_int8_vec",  # r12: ARRAY output -> exploded (vec_id,
    #   pos, q) scalar form — now hash-eligible (the r11 rows-only
    #   record came back as a driver TypeError on the ARRAY column)
    "sample_unimax",         # r12: sharded_multi rank+prefix, df_q form
    "text_unigram_lm",       # r12: closed-form NTILE over sharded_rank
    # oldest-graded regrades: the 14-entry REMAINDER of the r4 cohort
    # (its alphabetical first 31 were regraded in r11 — cohort closed)
    "subq_derived",
    "subq_exists_or",
    "subq_in",
    "subq_not_in",
    "text_bm25",
    "text_bpe_tokens",
    "text_chunk_sliding",
    "text_pii_redact",
    "text_vocab_topk",
    "win_first_last",
    "win_lag_lead",
    "win_nth_value",
    "win_range_frame",
    "win_topk_per_group",
    # next-oldest cohort (latest driver row r5; alphabetical first 26
    # of the 46 non-canary entries — the remaining 18 queue for r13)
    "agg_filter_clause",
    "agg_over_derived",
    "agg_rollup",
    "agg_string_agg",
    "agg_where_then_group",
    "asof_join_purchases",
    "corpus_curation_pipeline",
    "dedup_clusters_bigstar",
    "dedup_cross_source_audit",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_uncapped",
    "dedup_repeated_chunks",
    "dedup_semantic",
    "dedup_survivor_selection",
    "emb_label_dispersion",
    "expr_datetime",
    "expr_datetime_extras",
    "expr_string_extras",
    "join_full_outer",
    "json_filter_agg",
    "lateral_topn_per_key",
    "mix_source_kl",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
)

# Oracle-checked entries queued for the ROUND-13 window: entries ADDED
# during round 12 are appended as they land, followed by the oldest
# regrades if slots remain. tests/test_registry.py enforces that
# window + NEXT_WINDOW + graded union covers every oracle-checked entry
# AND that this queue never exceeds one window's capacity.
NEXT_WINDOW: tuple[str, ...] = (
    "jpeg_restart_interval_decode_real",  # REAL codec #9: DRI/RSTm
    "sim_ivfpq_topk",  # IVF+PQ composed probe, exact-int routing
)

_ALL: dict[str, Q] = {}
for _m in _MODULES:
    for _name, _q in _m.QUERIES.items():
        if _name in _ALL:
            raise ValueError(f"duplicate query name: {_name}")
        _ALL[_name] = _q

_missing = [n for n in PRIORITY if n not in _ALL]
if _missing:
    raise ValueError(f"PRIORITY names not registered: {_missing}")

REGISTRY: dict[str, Q] = {n: _ALL[n] for n in PRIORITY}
for _name, _q in _ALL.items():
    if _name not in REGISTRY:
        REGISTRY[_name] = _q
