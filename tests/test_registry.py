"""The correctness driver grades only the FIRST 50 registry entries.

The window ROTATES per round so every oracle-checked entry eventually gets
a hard-signal driver row (r1-r4 graded 135 distinct entries; the round-5
window grades the 31-entry never-sampled tail, closing it). These tests
pin the rotation's invariants:

- the window is exactly the first 50 registry entries,
- every windowed entry carries a DuckDB oracle (no slot wasted on a
  rows-only check),
- every entry whose output representation changed this round is in the
  window (regression canaries),
- the round-4 ungraded tail is fully inside the window,
- family coverage holds over the UNION of past driver rows and the current
  window — rotating the window must not leave a family with no hard signal
  anywhere,
- the hash-boundary contract (no ARRAY/MAP Spark outputs, no
  HUGEINT/DECIMAL oracle types) holds for every oracle-checked entry.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from cassandra_sql_spark.queries import NEXT_WINDOW, PRIORITY, REGISTRY

_REPO = Path(__file__).resolve().parent.parent

# Entries whose output representation changed this round — all must be in
# the window so the changed output gets re-graded. Round 11:
# stat_kruskal_wallis (r10 ulp-snap; its only driver row is pre-snap r9)
# and emb_mahalanobis_outliers (r11 quantization fix — the r10 form
# floor-quantized every term to 0, ADVICE high; never driver-graded but
# pinned here so the fix cannot rotate out untested).
_CANARIES: set[str] = {"stat_kruskal_wallis", "emb_mahalanobis_outliers"}

# One-or-more graded representatives required per SURVEY §2 / pipeline
# family, checked against union(past driver rows, current window).
_FAMILIES: dict[str, set[str]] = {
    "tpch": {"q1_pricing_summary", "q5_local_supplier_volume"},
    "2.1/2.2 scan+predicates": {
        "scan_filter_project", "pred_like", "pred_regex",
        "pred_null_safe_eq",
    },
    "2.3 joins": {"join_full_outer", "join_salted_skew"},
    "2.4 aggregation": {
        "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_percentiles",
        "agg_approx_distinct_bound", "agg_over_join", "agg_manual_pivot",
    },
    "2.5 windows": {
        "win_ranking", "win_running_agg", "win_sliding_frame",
        "win_distribution", "win_lag_lead", "win_first_last",
        "win_range_frame", "win_topk_per_group", "win_nth_value",
    },
    "2.6 set ops": {
        "setop_union_all", "setop_intersect_all", "setop_except_all",
        "select_distinct", "setop_union_distinct", "setop_intersect",
        "setop_except",
    },
    "2.7 subqueries": {
        "subq_correlated", "subq_scalar_select", "subq_cte",
        "recursive_cte", "subq_in", "subq_not_in", "subq_scalar_where",
        "subq_derived", "subq_exists_or",
    },
    "2.8 expressions": {
        "expr_case", "expr_arithmetic", "expr_math_transcendental",
        "expr_datetime", "expr_cast", "expr_concat", "expr_math",
    },
    "2.8 json/arrays": {
        "json_filter_agg", "array_ops", "json_extract_scalar",
        "explode_tokens", "array_agg_per_group",
    },
    "timeseries rollup": {"hypertable_rollup"},
    "pipeline dedup": {
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_embedding_lsh", "dedup_clusters", "dedup_embedding_cosine",
    },
    "pipeline decontam": {"decontam_ngram_overlap"},
    "pipeline similarity": {"sim_topk_bruteforce"},
    "pipeline embeddings": {
        "emb_random_projection", "emb_quantize_int8", "emb_label_centroids",
    },
    "pipeline text": {
        "text_stats", "text_repetition_filter", "text_bpe_tokens",
        "text_vocab_topk", "text_bm25", "text_chunk_sliding",
        "text_pii_redact",
    },
    "pipeline sampling": {
        "sample_stratified", "sample_md5_split", "pack_token_budget",
    },
    "pipeline multimodal": {
        "multimodal_resize", "multimodal_binary_meta",
        "multimodal_frame_sample",
    },
    "temporal": {"asof_join_purchases", "range_join_events"},
    "streaming": {
        "stream_window_agg", "stream_stream_join", "stream_static_join",
        "stream_dedup", "event_sessionize_batch",
    },
}


def _graded_union(through: int = 99) -> set[str]:
    names: set[str] = set()
    for f in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        if int(f.stem.split("_r")[1]) <= through:
            names |= set(json.loads(f.read_text()))
    return names


def test_priority_window_is_first_50():
    assert len(PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(PRIORITY)


def test_priority_names_unique_and_registered():
    assert len(set(PRIORITY)) == len(PRIORITY)
    for name in PRIORITY:
        assert name in REGISTRY, name


def test_canaries_in_window():
    missing = _CANARIES - set(PRIORITY)
    assert not missing, f"representation-changed canaries not graded: {missing}"


def test_window_closes_never_graded_tail():
    """The r11 window contains EVERY oracle-checked entry with no driver
    row through r10 — the 16 round-10 additions staged in NEXT_WINDOW all
    fit one window; the remaining slots regrade the oldest driver rows
    (plus the two rows-only entries, see
    test_priority_entries_all_have_oracles)."""
    graded = _graded_union(through=10)
    oracle_checked = {n for n in REGISTRY if REGISTRY[n].oracle is not None}
    never_graded = oracle_checked - graded
    # entries ADDED during round 11 stage in NEXT_WINDOW for the r12 window;
    # everything never-graded at rotation time must be in THIS window
    missing = never_graded - set(PRIORITY) - set(NEXT_WINDOW)
    assert not missing, f"never-graded entries left out of the window: {missing}"


def test_window_fillers_are_oldest_regrades():
    """The non-tail slots go to the entries whose latest driver grading
    is oldest (latest r4; the alphabetical first 31 of that 45-entry
    cohort) plus the stat_kruskal_wallis representation canary —
    regression re-coverage, not padding."""
    graded10 = _graded_union(through=10)
    regrades = set(PRIORITY) & graded10
    r4_cohort_head = {
        "agg_approx_percentile_bound", "agg_manual_pivot", "agg_over_join",
        "dedup_embedding_cosine", "dedup_embedding_lsh",
        "emb_label_centroids", "emb_random_projection",
        "event_sessionize_batch", "explode_tokens", "expr_cast",
        "expr_coalesce_nullif", "expr_concat", "expr_datediff_format",
        "expr_math", "expr_math_transcendental", "expr_string_funcs",
        "expr_time_bucket_agg", "json_extract_scalar",
        "multimodal_binary_meta", "multimodal_frame_sample",
        "pack_token_budget", "pred_null_safe_eq", "range_join_events",
        "sample_md5_split", "series_calendar_fill", "setop_intersect",
        "setop_union_distinct", "sim_topk_bruteforce", "stream_dedup",
        "stream_stream_join", "stream_stream_left_join",
    }
    assert regrades == r4_cohort_head | {"stat_kruskal_wallis"}


def test_ungraded_tail_fits_one_window():
    """Structural cap on grading-coverage erosion (r6 verdict task #2):
    every oracle-checked entry with no driver row must be in the CURRENT
    window or in NEXT_WINDOW, and NEXT_WINDOW must fit one 50-slot
    rotation. New oracle-checked entries may land only as fast as the
    window rotates — otherwise this pin fails and the round must grade
    before it grows."""
    graded = _graded_union()
    oracle_checked = {n for n in REGISTRY if REGISTRY[n].oracle is not None}
    never_graded = oracle_checked - graded
    stray = never_graded - set(PRIORITY) - set(NEXT_WINDOW)
    assert not stray, f"never-graded entries not staged anywhere: {sorted(stray)}"
    assert len(NEXT_WINDOW) <= 50, (
        f"NEXT_WINDOW ({len(NEXT_WINDOW)}) exceeds one grading window; "
        "stop adding oracle-checked entries until the window rotates"
    )


def test_union_covers_every_family():
    signal = _graded_union() | set(PRIORITY)
    uncovered = [
        fam for fam, reps in _FAMILIES.items() if not (signal & reps)
    ]
    assert not uncovered, f"families with no hard signal anywhere: {uncovered}"


# The two structurally hash-ineligible entries (float-iterative PCA;
# ARRAY-output int8 vectors — COVERAGE.md). A driver rows-only record is
# the STRONGEST signal they can carry, so the r11 window spends exactly
# two slots to give them one; every other slot must carry a full oracle.
_ROWS_ONLY_WINDOWED = {"emb_pca_top_component", "emb_quantize_int8_vec"}


def test_priority_entries_all_have_oracles():
    """The graded window is wasted on rows-only entries — every slot in
    the first 50 must carry a DuckDB oracle for the full hash compare,
    except the two documented hash-ineligible entries collecting their
    one-time rows-only driver record this round."""
    missing = [
        n for n in PRIORITY
        if REGISTRY[n].oracle is None and n not in _ROWS_ONLY_WINDOWED
    ]
    assert not missing, f"priority entries without oracles: {missing}"
    for n in _ROWS_ONLY_WINDOWED:
        assert REGISTRY[n].oracle is None, f"{n} grew an oracle; un-exempt it"


def test_next_window_closes_oracle_checked_tail():
    """window + NEXT_WINDOW + past rounds == every oracle-checked entry:
    by end of round 5 the graded union is complete."""
    graded = _graded_union()
    oracle_checked = {n for n in REGISTRY if REGISTRY[n].oracle is not None}
    ungraded_after_r5 = (
        oracle_checked - graded - set(PRIORITY) - set(NEXT_WINDOW)
    )
    assert not ungraded_after_r5, sorted(ungraded_after_r5)
    for n in NEXT_WINDOW:
        assert n in REGISTRY and REGISTRY[n].oracle is not None, n


# Entries whose EMPTY result is the point of the test (everything else
# returning 0 rows is a vacuous fixture — a green driver row that
# verifies nothing, the r5 `pred_like_any_all` failure class).
_INTENTIONALLY_EMPTY = {"limit_zero"}


@pytest.mark.slow
def test_no_vacuous_fixtures_at_driver_sf():
    """Every oracle-checked entry must yield >=1 row at sf0.01 — the
    scale the correctness driver grades at. A predicate stack that
    matches nothing (e.g. LIKE patterns outside the fixture's value
    domain) hash-matches trivially and proves nothing. DuckDB-only:
    the Spark side is value-identical by the oracle gate, so auditing
    the oracle audits both."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    from cassandra_sql_spark.io import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    vacuous = []
    for name, q in REGISTRY.items():
        if q.oracle is None or name in _INTENTIONALLY_EMPTY:
            continue
        nonempty = con.sql(
            f"SELECT EXISTS (SELECT 1 FROM ({q.oracle}) _t)"
        ).fetchone()[0]
        if not nonempty:
            vacuous.append(name)
    con.close()
    assert not vacuous, f"vacuous 0-row fixtures: {vacuous}"


@pytest.mark.slow
def test_oracle_checked_outputs_respect_hash_boundary(spark, duck, sf_dir):
    """Round-4 postmortem contract: the driver's hasher crashes on
    ARRAY/MAP Spark output columns, and DuckDB HUGEINT/DECIMAL oracle
    columns render float64-style on fetch (value-equal, hash-red). Every
    oracle-checked entry must ship scalar columns on both sides. Both
    checks are plan-time only (lazy Spark schema; DuckDB bind) — no query
    executes here."""
    from cassandra_sql_spark.testing import boundary_problems

    bad = {}
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        df = q.fn(spark, sf_dir)
        rel = duck.sql(q.oracle)
        problems = boundary_problems(df.dtypes, rel.columns, rel.types)
        if problems:
            bad[name] = problems
    assert not bad, f"hash-boundary contract violations: {bad}"


def test_coverage_doc_totals_match_registry():
    """The COVERAGE.md headline totals must equal the live registry —
    the r8 round-close prose went stale when an entry landed after the
    bookkeeping commit (r8 verdict, What's wrong #3). The doc states
    them as '**NNN registry queries — MMM oracle-checked**'."""
    import re

    text = (_REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"\*\*(\d+) registry queries —\s*(\d+)\s*oracle-checked\*\*",
        text,
    )
    assert m, "COVERAGE.md headline totals not found"
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert int(m.group(1)) == len(REGISTRY), (
        f"COVERAGE.md says {m.group(1)} registry entries; "
        f"live registry has {len(REGISTRY)}"
    )
    assert int(m.group(2)) == n_oracle, (
        f"COVERAGE.md says {m.group(2)} oracle-checked; live count is "
        f"{n_oracle}"
    )
