"""Physical-plan audit: the scale-critical properties every operator must
keep for the 100 TB design point (SURVEY §4.2, README architecture notes).

These pin the *plan shape*, not timings, so they are stable across machines:
- filters/column pruning reach the parquet scan (no full-row decode — the
  reference decodes all columns then filters, kv/KvQueryExecutor.java:1083-1088;
  we require the opposite);
- aggregates are partial+final (map-side combine bounds the shuffle);
- no CartesianProduct outside the explicit CROSS JOIN entry;
- dimension joins are broadcast (no fact-table shuffle);
- hot relational paths stay JVM-side (no Python row UDF in the plan).
"""

from __future__ import annotations

import re

import pytest

from cassandra_sql_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- predicate pushdown & column pruning ------------------------------------

def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    # shipdate range + discount bounds + quantity bound all pushed
    assert "PushedFilters:" in plan
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan).group(1)
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"):
        assert frag in pushed, plan


def test_column_pruning_q1(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # 7 referenced columns only — not the 16-column full row
    assert cols == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }, cols


def test_point_lookup_pushes_pk_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "point_lookup")
    assert re.search(r"PushedFilters: \[.*EqualTo\(", plan), plan


# --- aggregation: map-side combine ------------------------------------------

@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q5_local_supplier_volume", "agg_groupby_multi"]
)
def test_partial_final_aggregation(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "partial_" in plan, f"{name}: no map-side partial aggregation"
    assert plan.count("HashAggregate") >= 2, name


# --- joins ------------------------------------------------------------------

@pytest.mark.slow
def test_no_cartesian_outside_cross_join(spark, sf_dir):
    for name in sorted(REGISTRY):
        if name in ("join_cross",):
            continue
        # pipeline/streaming ops build their own inputs; audit SQL surface
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    # nation/region/supplier/customer must all come in via broadcast
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items",
     "q7_volume_shipping", "q8_market_share", "q9_product_profit",
     "q18_large_volume_customer"],
)
def test_fact_table_is_streamed_not_broadcast(spark, sf_dir, name):
    """lineitem must be the leftmost (streamed) leaf, never broadcast-built:
    the shape that survives 100 TB (SCALE.md §3)."""
    plan = plan_of(spark, sf_dir, name)
    first_scan = re.search(r"Location: InMemoryFileIndex \[[^\]]*?(\w+)\.parquet\]", plan)
    assert first_scan.group(1) == "lineitem", f"{name}: {first_scan.group(1)}"
    # no BroadcastExchange node may take its input from the lineitem scan:
    # in the formatted tree the lineitem scan is node (1), referenced only
    # by the leftmost join spine
    for m in re.finditer(r"\(\d+\) BroadcastExchange\nInput \[\d+\]: \[([^\]]*)\]", plan):
        assert "l_extendedprice" not in m.group(1), f"{name} broadcasts lineitem"


def test_semi_anti_joins_planned(spark, sf_dir):
    semi = plan_of(spark, sf_dir, "join_semi")
    anti = plan_of(spark, sf_dir, "join_anti")
    assert "LeftSemi" in semi, semi
    assert "LeftAnti" in anti, anti


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_orderby_limit")
    assert "TakeOrderedAndProject" in plan, plan


# --- JVM-side execution ------------------------------------------------------

@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "q9_product_profit",
     "win_topk_per_group", "agg_count_distinct", "json_filter_agg"],
)
def test_sql_hot_path_has_no_python_udf(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"{name} fell off the JVM path: {marker}"


def test_codegen_covers_agg_spine(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen


# --- exact dedup stays distributed ------------------------------------------

def test_dedup_exact_is_shuffle_agg_not_collect(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_exact")
    assert "HashAggregate" in plan or "Window" in plan, plan


# --- pipeline operators: scale-critical plan shapes -------------------------

def test_ngram_jaccard_capped_scans_corpus_once(spark, sf_dir):
    """The capped inverted-index path materializes the exploded shingle
    index ONCE (round 13: a hash-partitioned persist; previously a
    localCheckpoint) and feeds both the hot-shingle stoplist agg and the
    posting-list agg from it — no second scan+shingle pass of the corpus
    (the round-3 plan re-derived the index from a second parquet scan).
    The hot set still broadcasts into an anti-join BEFORE the
    collect_list shuffle.

    With a persist, the cached relation's own subplan (which contains
    the one legitimate parquet scan) is re-RENDERED under every
    InMemoryTableScan consumer, so textual 'Scan parquet' counts no
    longer measure executed scans; the invariant is instead: every
    consumer reads the SAME InMemoryRelation (one cacheBuilder id),
    and both index consumers are InMemoryTableScans.

    CacheManager substitutes ANY still-cached frame whose plan subtree
    matches (other tests in the session may have persisted overlapping
    frames), which would add extra InMemoryTableScans — clear the cache
    first so the plan shows exactly this query's own materialization."""
    spark.catalog.clearCache()
    plan = plan_of(spark, sf_dir, "dedup_ngram_jaccard")
    assert len(re.findall(r"\(\d+\) InMemoryTableScan", plan)) == 2, plan
    # exactly one distinct cached relation feeds them: the rendered
    # cached subplans are identical (same one-scan index both times)
    rels = re.findall(r"\(\d+\) InMemoryRelation", plan)
    assert len(rels) == 2, plan
    assert "BroadcastExchange" in plan, plan
    # the no-exchange-above-the-cache property is pinned precisely (on
    # an executed plan) in tests/test_pipeline.py::
    # test_r13_cascade_index_partitioning_and_nonce


def test_minhash_lsh_scans_corpus_once(spark, sf_dir):
    """The shingle table and signatures are checkpointed at construction:
    the final plan must read only the materialized indexes (ExistingRDD),
    never re-scan + re-shingle the corpus parquet (the pre-round-4 plan
    ran four shingle passes)."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert "Scan parquet" not in plan, plan


def test_decontam_broadcasts_eval_side(spark, sf_dir):
    """The train corpus must never shuffle: the (small) eval n-gram side
    broadcasts into a map-side join."""
    plan = plan_of(spark, sf_dir, "decontam_ngram_overlap")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_random_projection_is_map_only(spark, sf_dir):
    """JL projection must be a pure scan->project plan: no shuffle, no
    Python, at any scale."""
    plan = plan_of(spark, sf_dir, "emb_random_projection")
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, plan


@pytest.mark.parametrize(
    "name",
    ["text_repetition_filter", "text_chunk_sliding", "text_pii_redact",
     "text_vocab_topk", "multimodal_frame_sample", "sample_stratified",
     "sample_source_quota", "emb_quantize_int8"],
)
def test_pipeline_text_paths_stay_jvm_side(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"{name} fell off the JVM path: {marker}"


def test_lsh_index_probe_partition_prunes(spark, sf_dir, tmp_path):
    """The materialized ANN index: a probe against the bucket-partitioned
    layout must (a) carry the bucket as a partition filter in the scan,
    (b) read strictly fewer files than the full index, and (c) return
    exactly what the inline bucket probe returns."""
    from cassandra_sql_spark.io import load
    from cassandra_sql_spark.pipeline import similarity

    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "lsh_index")
    similarity.write_lsh_partitioned(emb, path, planes=4)

    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0][1]]
    probe = similarity.topk_lsh_pruned(spark, path, qvec, k=10, planes=4)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "_bucket" in plan
    # pruning is real: the executed scan reads fewer files than the index
    # holds (inputFiles() lists pre-pruning, so read runtime SQLMetrics)
    n_all = len(spark.read.parquet(path).inputFiles())
    qe = probe._jdf.queryExecution()
    qe.executedPlan().execute().count()

    def scan_files_read(node):
        if "Scan" in node.nodeName():
            mts = node.metrics().toList()
            for i in range(mts.size()):
                kv = mts.apply(i)
                if kv._1() == "numFiles":
                    return int(kv._2().value())
        for attr in ("executedPlan", "plan"):
            if ("AdaptiveSparkPlan" in node.nodeName() and attr == "executedPlan") or (
                "QueryStage" in node.nodeName() and attr == "plan"
            ):
                return scan_files_read(getattr(node, attr)())
        ch = node.children()
        for i in range(ch.size()):
            got = scan_files_read(ch.apply(i))
            if got is not None:
                return got
        return None

    n_read = scan_files_read(qe.executedPlan())
    assert n_read is not None and 0 < n_read < n_all
    # and the result equals the inline (unmaterialized) bucket probe,
    # minus the query row itself which topk_lsh excludes
    inline = {
        (r.vec_id, r.score)
        for r in similarity.topk_lsh(emb, query_id=0, k=11, planes=4)
        .collect()
    }
    pruned = {
        (r.vec_id, r.score)
        for r in probe.collect()
        if r.vec_id != 0
    }
    assert pruned <= inline


def test_ivf_index_probe_partition_prunes(spark, sf_dir, tmp_path):
    """IVF analog of the LSH index test: probe reads only the nprobe
    nearest centroid partitions, and equals the inline (unmaterialized)
    IVF probe with the same deterministic model."""
    from cassandra_sql_spark.io import load
    from cassandra_sql_spark.pipeline import similarity

    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_index")
    centroids = similarity.write_ivf_partitioned(emb, path, n_centroids=8)

    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0][1]]
    probe = similarity.topk_ivf_pruned(
        spark, path, centroids, qvec, k=10, nprobe=4
    )
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "_cid" in plan
    # same model + same params as the inline probe -> identical answer,
    # except the query row itself which the inline path excludes
    inline = {
        (r.vec_id, r.score)
        for r in similarity.topk_ivf(
            emb, query_id=0, k=10, n_centroids=8, nprobe=4
        ).collect()
    }
    pruned = {
        (r.vec_id, r.score)
        for r in probe.collect()
        if r.vec_id != 0  # query row occupies one slot in the pruned top-k
    }
    assert len(pruned) == 9
    assert pruned <= inline  # identical ids AND scores for the overlap


def test_chunk_and_frame_sample_have_no_shuffle(spark, sf_dir):
    for name in ("text_chunk_sliding", "multimodal_frame_sample"):
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange" not in plan, f"{name} shuffles: map-only op"


def test_repeated_chunk_dedup_plan_shape(spark, sf_dir):
    """First-occurrence is a partial-aggregable MIN GROUP BY chunk-hash
    (map-side combine — skew-proof on hot boilerplate chunks), never a
    row_number window over the chunk key; and the exploded chunk stream is
    materialized once (localCheckpoint) feeding both the agg and the join
    probe — no second scan+chunk pass of the corpus."""
    plan = plan_of(spark, sf_dir, "dedup_repeated_chunks")
    assert "Scan parquet" not in plan, plan
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) == 2, plan
    # partial+final agg pair on the chunk hash; no Window over it
    assert re.search(r"HashAggregate.*\n.*Exchange.*\n.*HashAggregate", plan) or (
        plan.count("HashAggregate") >= 2
    ), plan
    assert "Window" not in plan, plan


# --- data-selection operators: model tables broadcast, corpus map-only ------

@pytest.mark.parametrize("name", ["text_unigram_lm", "dsir_importance"])
def test_selection_model_tables_broadcast(spark, sf_dir, name):
    """The LM / bucket-weight model join must broadcast the (tiny) model
    side — the corpus-sized explode stream is never shuffled to meet it —
    and scoring stays JVM-side (no Python UDF in the plan). r12: BOTH
    entries' rank tails now run through sharded_rank, whose checkpoint
    truncates the final plan, so the model join + map-side combine are
    pinned at the scoring/weighting stage directly."""
    from cassandra_sql_spark.io import load
    from cassandra_sql_spark.pipeline import selection
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    if name == "dsir_importance":
        w = selection.dsir_bucket_weights(docs, "text", F.col("lang") == "en")
        d = selection.dsir_doc_weights(docs, "doc_id", "text", w)
    else:
        lm = selection.unigram_lm_table(docs, "text")
        d = selection.unigram_nll(docs, "doc_id", "text", lm)
    build = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in build and "partial_" in build
    assert "BatchEvalPython" not in build and "ArrowEvalPython" not in build


def test_label_dispersion_partial_aggs(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "emb_label_dispersion")
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- QUALIFY rewrite plan shape --------------------------------------------

def test_qualify_rank_predicate_gets_window_group_limit(spark, sf_dir):
    """The QUALIFY rewrite projects the predicate as a boolean and
    filters it outside; Catalyst must still collapse that into a direct
    rank filter and insert the Partial WindowGroupLimit BELOW the
    exchange — per-partition top-k before any shuffle, the shape that
    makes QUALIFY-top-n survive a 1000-executor fan-in. If this pin
    breaks, rewrite _rewrite_qualify to extract window expressions into
    named columns and filter those directly."""
    import re

    plan = plan_of(spark, sf_dir, "qualify_topn")
    # formatted explain numbers children lower than parents: a partial
    # (pre-shuffle) group limit is a WindowGroupLimit node numbered
    # BELOW some Exchange node
    wgl = [int(n) for n in re.findall(r"\((\d+)\) WindowGroupLimit", plan)]
    exch = [int(n) for n in re.findall(r"\((\d+)\) Exchange", plan)]
    assert len(wgl) >= 2, plan  # Partial + Final pair
    assert exch and min(wgl) < max(exch), plan


def test_fetch_with_ties_gets_window_group_limit(spark, sf_dir):
    """The WITH TIES rewrite (global RANK <= n) must compile to the
    Partial/Final WindowGroupLimit pair with the partial BELOW the
    single-partition exchange — each partition ships at most its own
    rank<=n prefix, so the global fan-in is bounded by n*partitions,
    not the table."""
    import re

    plan = plan_of(spark, sf_dir, "fetch_with_ties")
    wgl = [int(n) for n in re.findall(r"\((\d+)\) WindowGroupLimit", plan)]
    exch = [int(n) for n in re.findall(r"\((\d+)\) Exchange", plan)]
    assert len(wgl) >= 2, plan
    assert exch and min(wgl) < max(exch), plan


def test_quantified_subquery_is_scalar_agg_not_loop(spark, sf_dir):
    """`> ALL (sub)` rewrites to ONE scalar MIN/MAX subquery (a
    broadcast-able aggregate result), and `= ANY (sub)` to a semi join —
    never a per-row quantified loop or cartesian product."""
    plan = plan_of(spark, sf_dir, "subq_quantified")
    assert "Subquery" in plan            # scalar agg subquery present
    assert "LeftSemi" in plan            # = ANY -> IN -> semi join
    assert "CartesianProduct" not in plan


def test_unpivot_stays_map_side(spark, sf_dir):
    """UNPIVOT is an Expand/Generate over the scan — no shuffle."""
    plan = plan_of(spark, sf_dir, "unpivot_measures")
    assert "Exchange" not in plan


def test_pagerank_iterations_never_rescan_the_event_log(spark, sf_dir):
    """graph_pagerank materializes the weighted edge list once; the
    3-iteration rank plan must reference only the checkpointed graph.
    (The pure-SQL CTE form re-expands under Catalyst inlining into 22
    scans + 22 window sorts of the raw log — fatal at 100 TB.)"""
    plan = plan_of(spark, sf_dir, "graph_pagerank")
    assert "Scan parquet" not in plan, plan
    assert "Window" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


# --- round-7 additions --------------------------------------------------


def test_multimodal_decode_real_is_map_only(spark, sf_dir):
    """Fixture synthesis + real BMP decode + resize must stay one
    Arrow-batched map chain: no shuffle, blobs never leave the worker."""
    plan = plan_of(spark, sf_dir, "multimodal_decode_real")
    assert "Exchange" not in plan, plan
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") >= 1


def test_drawdown_windows_share_one_partitioning(spark, sf_dir):
    """Both running windows partition by user_id, so the plan must hash-
    shuffle ONCE for the window stack (the second Exchange is the final
    presentation sort, a rangepartitioning)."""
    plan = plan_of(spark, sf_dir, "series_drawdown")
    hash_exch = plan.count("hashpartitioning")
    assert hash_exch <= 1, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2, plan


def test_lsh_topk_is_broadcast_probe_plus_take_ordered(spark, sf_dir):
    """LSH top-k: the 1-row query side broadcasts, candidates stream, and
    the top-k is TakeOrderedAndProject (no full sort)."""
    for name in ("sim_lsh_topk", "sim_lsh_multiprobe"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        assert "TakeOrderedAndProject" in plan, plan


def test_basket_lift_joins_collapse_to_distinct_items_first(spark, sf_dir):
    """The pair self-join must run on the DISTINCT (order, type) set —
    an aggregate appears below the self-join, bounding fan-out to
    C(items-per-order, 2) instead of squaring raw line items."""
    plan = plan_of(spark, sf_dir, "basket_pair_lift")
    assert "CartesianProduct" not in plan
    m_join = re.search(r"\(\d+\) SortMergeJoin|\(\d+\) ShuffledHashJoin"
                       r"|\(\d+\) BroadcastHashJoin", plan)
    assert m_join, plan
    assert "HashAggregate" in plan


# --- round-8 additions --------------------------------------------------


def test_graph_depth_entries_never_rescan_the_event_log(spark, sf_dir):
    """clustering-coefficient references the edge set 4x and
    neighbor-Jaccard 5x — both must read the ONE checkpointed edge
    list, never the raw log (the pagerank CTE-inlining trap)."""
    for name in ("graph_clustering_coeff", "graph_jaccard_neighbors"):
        plan = plan_of(spark, sf_dir, name)
        assert "Scan parquet" not in plan, (name, plan)
        assert "Scan ExistingRDD" in plan, (name, plan)


def test_sentence_dedup_is_single_scan_single_window(spark, sf_dir):
    """The corpus-wide sentence counts come from a WINDOW over the one
    exploded scan — a join against a separate aggregate would re-scan
    and re-explode the whole corpus (no common-subplan reuse)."""
    plan = plan_of(spark, sf_dir, "text_sentence_dedup")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_burstiness_corpus_count_prunes_to_metadata(spark, sf_dir):
    """text_burstiness's N comes from COUNT(*) over documents — that
    side must not read the text column (ReadSchema pruned to nothing
    or doc id only). clearCache first: other suites cache
    load(documents), and Spark's cache manager substitutes the cached
    relation into any matching subtree, hiding the pruned parquet
    scan this pin asserts on."""
    spark.catalog.clearCache()
    plan = plan_of(spark, sf_dir, "text_burstiness")
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert any("text" not in ln for ln in scans), plan


def test_range_search_broadcasts_the_one_row_query(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sim_range_search")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # threshold filter, not a top-k: no TakeOrdered global cut
    assert "CartesianProduct" not in plan


# --- round-9 additions --------------------------------------------------


def test_ngram_coverage_window_input_is_bounded_head(spark, sf_dir):
    """The cumulative head-coverage window must run over the pre-limited
    top-1000 head, NEVER the full distinct-trigram vocabulary — the
    full-vocab unpartitioned window was a single-reducer global sort
    over billions of rows at 100 TB (r8 verdict, What's wrong #2). In
    the formatted plan the Window's child chain must hit a
    TakeOrderedAndProject(limit=1000) BEFORE any parquet scan: the
    per-partition partial top-k is what bounds the window's input."""
    plan = plan_of(spark, sf_dir, "text_ngram_coverage")
    tree = plan.split("\n\n")[0].splitlines()
    win = next(i for i, ln in enumerate(tree) if "Window (" in ln)
    depth = tree[win].index("Window")
    subtree = []
    for ln in tree[win + 1:]:
        node = re.search(r"[A-Za-z]", ln)
        if node is None or node.start() <= depth:
            break
        subtree.append(ln)
    take = next(
        (i for i, ln in enumerate(subtree) if "TakeOrderedAndProject" in ln),
        None,
    )
    assert take is not None, "\n".join(subtree)
    between = "\n".join(subtree[:take])
    assert "Scan parquet" not in between, (
        "Window consumes an unbounded corpus-derived input:\n" + between
    )
    # the head cut is the 1000-row grid max, not some larger limit
    assert re.search(
        r"TakeOrderedAndProject\nInput.*\nArguments: 1000,", plan
    ), plan


def test_knn_join_broadcasts_probes_and_limits_below_exchange(
    spark, sf_dir
):
    """The batch k-NN join must (a) broadcast the model-sized probe set
    (never shuffle the corpus for a 20-row side) and (b) plant a
    PARTIAL WindowGroupLimit below the rank exchange, so each input
    partition forwards at most top-5 rows per probe instead of its
    whole scored slice."""
    plan = plan_of(spark, sf_dir, "sim_knn_join")
    tree = plan.split("\n\n")[0]
    assert "BroadcastExchange" in tree, tree
    assert "CartesianProduct" not in tree, tree
    lines = tree.splitlines()
    wgl = [i for i, ln in enumerate(lines) if "WindowGroupLimit" in ln]
    exch = [
        i for i, ln in enumerate(lines)
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    # a WindowGroupLimit strictly BELOW (after, in tree print order)
    # some hash exchange = the partial, map-side cut
    assert wgl and exch and max(wgl) > min(exch), tree


# --- round-9 second wave: scan-count pins ------------------------------------

# Spark INLINES repeated CTE references: a groupBy+join-back (or scalar
# subquery) written once in SQL re-scans its source once per reference.
# The r9b entries were rewritten onto keyed windows / checkpointed
# intermediates after a plan audit found up to 10 scans of the raw log
# in the naive CTE forms. Pin the fact-table scan counts so the trap
# cannot silently return. (Each numbered "(n) Scan parquet" node is one
# real scan; entries at >1 carry a documented reason.)
R9B_SCAN_BUDGET = {
    "stat_jarque_bera": 1,
    "stat_durbin_watson": 1,
    "stat_ljung_box": 1,
    # checkpointed day table: tail reads ExistingRDD only
    "series_lead_lag_xcorr": 0,
    "event_user_entropy": 1,
    "series_seasonal_strength": 1,
    "stat_mi_cramers_v": 1,
    "series_bollinger_bands": 1,
    "series_theil_u2": 1,
    "text_simpson_diversity": 1,
    "emb_dim_variance_topk": 1,
    "part_revenue_abc": 1,
    "gif_decode_real": 1,
    # one full pass + one column-pruned MAX(ts) pass
    "event_decayed_revenue": 2,
    # checkpointed per-user flag table: tail reads ExistingRDD only
    "sketch_kmv_intersection": 0,
    # orders + lineitem: different tables
    "order_fulfillment_lag": 2,
    # train flags + eval bitmap + exact-verify side (documented audit)
    "sketch_bloom_fpr_audit": 3,
    "emb_participation_ratio": 1,
    # checkpointed customer rollup: tail reads ExistingRDD only
    "order_revenue_hhi": 0,
    # checkpointed intermediates: ALL reads come from ExistingRDD
    "text_js_divergence_sources": 0,
    "text_bigram_perplexity": 0,
    "graph_degree_assortativity": 0,
    "graph_shortest_hops": 0,
    "dedup_lsh_bucket_skew": 1,
}


@pytest.mark.parametrize("name", sorted(R9B_SCAN_BUDGET))
def test_r9b_scan_budget(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    n = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n <= R9B_SCAN_BUDGET[name], (
        f"{name}: {n} parquet scans (budget "
        f"{R9B_SCAN_BUDGET[name]}) — a CTE reference is re-scanning"
    )


# --- round-10: scale-killer rewrites + the unpartitioned-window lint ---------


def _window_subtree(plan: str, nth: int = 0):
    """Indent-delimited subtree lines under the nth Window node of a
    formatted plan tree (the ngram-coverage technique)."""
    tree = plan.split("\n\n")[0].splitlines()
    wins = [i for i, ln in enumerate(tree) if "Window (" in ln]
    win = wins[nth]
    depth = tree[win].index("Window")
    subtree = []
    for ln in tree[win + 1:]:
        node = re.search(r"[A-Za-z]", ln)
        if node is None or node.start() <= depth:
            break
        subtree.append(ln)
    return subtree


def test_fulfillment_window_input_is_bounded_aggregate(spark, sf_dir):
    """order_fulfillment_lag's percentile windows must consume the
    GROUP BY (priority, lag-day) rollup — a bounded 5 x ~125-row
    domain — never the raw orders><lineitem join (the r9 scale-killer:
    the whole fact table sorted through 5 reducers). A FINAL
    HashAggregate must sit between the Window and every parquet scan."""
    plan = plan_of(spark, sf_dir, "order_fulfillment_lag")
    # innermost Window's subtree (both windows share the one input)
    sub = _window_subtree(plan, nth=1)
    agg = next(
        (i for i, ln in enumerate(sub) if "HashAggregate" in ln), None
    )
    assert agg is not None, "\n".join(sub)
    between = "\n".join(sub[:agg])
    assert "Scan parquet" not in between, (
        "percentile Window consumes fact-sized rows:\n" + between
    )


def test_kmv_intersection_bottom32_is_head_cut(spark, sf_dir):
    """The bottom-32 sketch must come from a partial top-k head
    (TakeOrderedAndProject(32) — Catalyst's LimitPushDownThroughWindow
    rewrite of the rank-filter subquery), so the single-partition
    Window sees 32 rows, never the distinct-user set (r9 What's wrong
    #2: rank consumed inside an aggregate CASE defeated the pushdown)."""
    plan = plan_of(spark, sf_dir, "sketch_kmv_intersection")
    sub = _window_subtree(plan, nth=0)
    take = next(
        (i for i, ln in enumerate(sub) if "TakeOrderedAndProject" in ln),
        None,
    )
    assert take is not None, "\n".join(sub)
    assert "Scan" not in "\n".join(sub[:take]), "\n".join(sub)
    assert re.search(
        r"TakeOrderedAndProject\nInput.*\nArguments: 32,", plan
    ), plan


def test_hhi_has_no_window_and_top10_is_take_ordered(spark, sf_dir):
    """order_revenue_hhi needs global sums + a 10-row top-k: the plan
    must carry a TakeOrderedAndProject(10) and NO Window node at all
    (the old unpartitioned ROW_NUMBER single-partition-sorted the
    customer rollup)."""
    plan = plan_of(spark, sf_dir, "order_revenue_hhi")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree, tree
    assert "TakeOrderedAndProject" in tree, tree


# --- repo-wide unpartitioned-window lint (r9 verdict task #4) ----------------
#
# Every WindowExec with an EMPTY partition spec moves its whole input
# through one reducer. That is only acceptable when the input is
# provably bounded: a head cut (TakeOrdered/Limit/WindowGroupLimit
# below the window — detected structurally, no allowlisting needed) or
# a documented domain-bounded reduction (calendar days, contingency
# cells, dimension rollups, explicitly-documented corpus-rank entries
# with a written shard-at-scale note). Any NEW entry that plants an
# unpartitioned window over an unbounded fact-derived input fails this
# lint until it is reviewed onto the allowlist with a category.

_UNPARTITIONED_WINDOW_ALLOWLIST = {
    # day/calendar-domain window inputs (a GROUP BY date reduces first;
    # window rows are bounded by the calendar, never the event log)
    "series_autocorr": "day-domain",
    "series_bollinger_bands": "day-domain",
    "series_ewma": "day-domain",
    "series_gap_fill_interp": "day-domain",
    "series_pct_change": "day-domain",
    "series_peak_detection": "day-domain",
    "series_revenue_mom_yoy": "month-domain",
    "stat_chi_square": "weekday-cell-domain",
    "stat_kruskal_wallis": "distinct-cent-value rank domain",
    "stat_ks_two_sample": "day-domain",
    "stat_mann_whitney": "day-domain",
    "stat_runs_test": "day-domain",
    "stat_theil_sen": "day-pair domain",
    "stat_wilcoxon_signed_rank": "week-pair domain",
    "win_cumprod_growth": "month-domain",
    "win_rolling_corr": "day-domain",
    "event_max_concurrent_sessions": "day-boundary domain (hierarchical sweep)",
    "event_time_to_convert": "bounded integer lag-day domain",
    "stat_mi_cramers_v": "lang x source contingency cells",
    # surfaced by the r11 checkpoint-aware walker (RDDScan counts as
    # unbounded): all three window over CHECKPOINTED daily rollups —
    # day-domain cardinality, same class as the stat_* entries above
    "series_lead_lag_xcorr": "day-domain (checkpointed daily series)",
    "series_max_drawdown": "day-domain (checkpointed daily rollup)",
    "stat_grubbs_outlier": "day-domain (checkpointed daily rollup)",
    "stat_kaplan_meier": "bounded lag-day domain (risk-set/survival windows)",
    "order_repeat_purchase": "bounded inter-order gap-day domain",
    "event_frequency_migration": "4x4 band-matrix domain (share OVER ())",
    "skyline_pareto_2d": "size-domain (documented in entry)",
    # dimension-rollup window inputs (customer/part rollups; documented
    # in the entries + SCALE.md)
    "event_rfm_segmentation": "customer rollup (NTILE terciles)",
    "part_revenue_abc": "part rollup (full CDF genuinely needed: every part gets a class)",
    # documented corpus-rank entries: a global order IS the semantics
    # (top-fraction selection / quantile grid); each carries a written
    # shard-partitioned or approx_percentile scale fallback note
    # (r11) pack_token_budget, dsir_importance, and order_revenue_gini
    # left this list: their global ranks/prefix sums now run through
    # operators.global_order.sharded_rank/cumsum — no unpartitioned
    # window remains in their plans (pinned in tests/test_global_order).
    # (r12) sample_unimax and text_unigram_lm followed: the UniMax
    # rank+prefix ride one sharded_multi pass; the NTILE tertile is the
    # closed form over sharded_rank — the allowlist now holds only
    # genuinely domain-bounded windows.
    "text_zipf_fit": "vocab-rank (distinct tokens); documented cutoff",
    "emb_norm_quantiles": "norm quantile grid; documented approx fallback",
    "sketch_approx_quantile_bound": "exact-vs-GK audit needs the exact ranks",
}

_BOUNDING_NODES = {
    "TakeOrderedAndProjectExec", "GlobalLimitExec", "LocalLimitExec",
    "CollectLimitExec", "WindowGroupLimitExec",
}


def _jplan_children(node):
    out = []
    ch = node.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        out.append(node.initialPlan())
    return out


def _jplan_subqueries(node):
    out = []
    try:
        sq = node.subqueries()
        for i in range(sq.size()):
            out.append(sq.apply(i))
    except Exception:
        pass
    return out


def _scan_reachable_unbounded(node):
    nm = node.getClass().getSimpleName()
    if nm in _BOUNDING_NODES:
        return False
    if "FileSourceScan" in nm or "BatchScan" in nm:
        return True
    # r10 verdict What's-wrong #1: a localCheckpoint/cache merely
    # truncates LINEAGE, it does not bound CARDINALITY — a window fed
    # from a checkpointed fact rollup is exactly as unbounded as one fed
    # from the scan itself, so RDD/in-memory scans count as sources too
    if "RDDScan" in nm or "InMemoryTableScan" in nm or "ExistingRDD" in nm:
        return True
    return any(
        _scan_reachable_unbounded(c)
        for c in _jplan_children(node) + _jplan_subqueries(node)
    )


def _unbounded_unpartitioned_windows(df) -> int:
    """Count WindowExec nodes with an empty partition spec whose input
    subtree reaches a parquet scan without passing a bounding node."""
    n = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        nm = node.getClass().getSimpleName()
        if nm in ("WindowExec", "WindowInPandasExec"):
            if node.partitionSpec().isEmpty() and any(
                _scan_reachable_unbounded(c) for c in _jplan_children(node)
            ):
                n += 1
        stack.extend(_jplan_children(node) + _jplan_subqueries(node))
    return n


@pytest.mark.slow
def test_unpartitioned_window_lint(spark, sf_dir):
    spark.catalog.clearCache()
    offenders = []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, sf_dir)
        n = _unbounded_unpartitioned_windows(df)
        if n and name not in _UNPARTITIONED_WINDOW_ALLOWLIST:
            offenders.append(f"{name} ({n} window(s))")
    assert not offenders, (
        "unpartitioned window over unbounded fact-derived input; review "
        "the plan and either bound it (head cut / pre-aggregate) or add "
        "a documented allowlist entry: " + ", ".join(offenders)
    )


def test_unpartitioned_window_allowlist_is_tight(spark, sf_dir):
    """Allowlist hygiene: every allowlisted name must exist in the
    registry (no stale entries shielding future regressions)."""
    stale = set(_UNPARTITIONED_WINDOW_ALLOWLIST) - set(REGISTRY)
    assert not stale, f"stale allowlist entries: {sorted(stale)}"


# --- round-10 additions: scan-count pins -------------------------------------

R10_SCAN_BUDGET = {
    # checkpointed intermediates: tails read ExistingRDD only
    "order_revenue_gini": 0,
    "stat_grubbs_outlier": 0,
    "series_max_drawdown": 0,
    "graph_adamic_adar_topk": 0,
    "basket_lift_brand_pairs": 0,
    "dedup_edit_distance": 0,
    "stat_friedman_test": 0,
    # single-chain plans: one fact scan
    "event_new_vs_returning": 1,
    "stat_kaplan_meier": 1,
    "jpeg_color_decode_real": 1,
    # documented two-scan shapes: span scalar + main pass, LAG-seq +
    # per-customer counts, centroid/moment fit + scoring pass, base +
    # re-ingest overlay
    "event_frequency_migration": 2,
    "order_repeat_purchase": 2,
    "emb_simplified_silhouette": 2,
    "emb_mahalanobis_outliers": 2,
    "emb_duplicate_vectors": 2,
}


@pytest.mark.parametrize("name", sorted(R10_SCAN_BUDGET))
def test_r10_scan_budget(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    n = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n <= R10_SCAN_BUDGET[name], (
        f"{name}: {n} parquet scans (budget "
        f"{R10_SCAN_BUDGET[name]}) — a CTE reference is re-scanning"
    )


# --- round-11 additions: scan-count pins -------------------------------------

R11_SCAN_BUDGET = {
    # checkpointed intermediates: tails read ExistingRDD only
    "event_activity_gini": 0,
    "stat_page_trend": 0,
    "event_pingpong_rate": 0,  # bounded (a,b,pp) rollup checkpointed
    # single-chain plans: one documents scan
    "jpeg_progressive_decode_real": 1,
    "gif_animated_frame_sample": 1,
}


@pytest.mark.parametrize("name", sorted(R11_SCAN_BUDGET))
def test_r11_scan_budget(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    n = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n <= R11_SCAN_BUDGET[name], (
        f"{name}: {n} parquet scans (budget "
        f"{R11_SCAN_BUDGET[name]}) — a CTE reference is re-scanning"
    )
