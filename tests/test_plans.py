"""Physical-plan assertions: the properties that decide 100 TB behavior
must hold in the actual executed plans, not just in intent.

- filters and column pruning reach the parquet scan (PushedFilters /
  ReadSchema)
- dimension joins broadcast (BroadcastHashJoin), fact side never does
- aggregations are map-side partial (partial_sum before the exchange)
- blocked similarity join contains no CartesianProduct
"""

import pytest

from dbd_datawarehouse_scraper_spark.queries import QUERIES


def plan_of(spark, sf_dir, name):
    df = QUERIES[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "partial_sum" in plan, "aggregation must combine map-side"
    # column pruning: shipdate filter + 6 needed columns, not all 11
    assert "l_comment" not in plan


def test_thai_filter_pushed_to_scan(spark, sf_dir):
    # thai_filter rides inside text_norm_suite since the round-8
    # window rotation; its leg's customer scan must still prune to the
    # two needed columns (the contains-filter applies to a derived
    # column so it can't push to parquet)
    plan = plan_of(spark, sf_dir, "text_norm_suite")
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in plan


def test_broadcast_dim_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "broadcast_dim_join")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:500]
    assert "CartesianProduct" not in plan


def test_exact_core_join_broadcasts_candidates(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "exact_core_join")
    assert "BroadcastHashJoin" in plan


def test_similarity_join_is_blocked_not_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "similarity_fallback_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_cosine_dedup_is_bucketed_not_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "embedding_cosine_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_joins_stay_semi_anti(spark, sf_dir):
    semi_anti = plan_of(spark, sf_dir, "semi_anti_join")
    assert "LeftSemi" in semi_anti
    assert "LeftAnti" in semi_anti


def test_projection_pruning_on_project_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "project_columns")
    assert "c_acctbal" not in plan  # unprojected column never read
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan


def test_exact_core_join_single_chain_eval_per_side(spark, sf_dir):
    """Round-4 perf property: the core-name chain appears exactly once
    per join side in the physical plan. Catalyst used to push the
    join-inferred isnotnull filter through the key projection,
    substituting (and re-evaluating) the whole chain; the
    explode(array(key)) Generate barrier stops that. The chain's
    _once bindings show as lambdafunction nodes — 2 nested bindings
    per key (step-1 result, then the NULL-for-empty fold) × 2 sides."""
    plan = plan_of(spark, sf_dir, "exact_core_join")
    # each chain instance contributes exactly 2 lambdafunction nodes
    # (the nested _once bodies); 2 sides -> 4. A pushed-through
    # duplicate doubles a side's count.
    assert plan.count("lambdafunction") == 4, plan.count("lambdafunction")
    assert plan.count("Generate explode") == 2


def test_pack_shards_no_corpus_scale_single_partition(spark, sf_dir):
    """Round-4 scale property: the only SinglePartition exchange in
    the packing plan sits over the per-partition TOTALS aggregate (one
    row per range partition), never over corpus-scale data, and the
    corpus is scanned once (the ranged relation is persisted because
    range exchanges are never reused — sampled boundaries)."""
    plan = plan_of(spark, sf_dir, "pack_shards")
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    # the totals leg: aggregate BELOW the single-partition exchange
    assert plan.count("Exchange SinglePartition") == 1
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, (
        "ranged relation must be persisted (no exchange reuse for "
        "range partitioning)"
    )


def test_generate_search_terms_no_inferred_filter_no_barrier(spark, sf_dir):
    """Round-5 perf property (the round-4 regression's root cause):
    the exploded search-terms plan must contain

    - NO Filter node evaluating regex chains: inner posexplode lets
      InferFiltersFromGenerate push `size(terms) > 0` — with the whole
      ~200-regex assembly tree substituted in — below the projections,
      evaluated per input row, interpreted (measured 4-5x the query).
      The OUTER explode + post-Generate null filter avoids it.
    - the variants staged as a SEPARATE projection (CollapseProject's
      multi-reference guard), so each regex chain evaluates once per
      row in codegen — no persist barrier needed: no InMemoryRelation.
    """
    plan = plan_of(spark, sf_dir, "generate_search_terms")
    for line in plan.splitlines():
        if "Filter" in line and "regexp" in line:
            raise AssertionError(f"regex filter leaked into plan: {line[:200]}")
    # one staged evaluation per variant: the regex population of the
    # whole plan stays at the staged projection's ~23 (blowup was >200)
    assert plan.count("regexp_replace") < 40, plan.count("regexp_replace")
    assert "Generate posexplode" in plan
    assert "InMemoryRelation" not in plan, "no persist barrier expected"


def test_chunk_documents_generate_is_outer_and_uninflated(spark, sf_dir):
    """The chunk fan-out uses posexplode_outer + an output-attribute
    null filter, so InferFiltersFromGenerate cannot clone the
    starts-producing expression (split + sequence) into an inferred
    size()>0 filter evaluated per input row; the split() population
    of the whole plan stays at the one staged evaluation."""
    plan = plan_of(spark, sf_dir, "chunk_documents")
    assert "Generate posexplode" in plan
    assert plan.count("split(") <= 4, plan.count("split(")
    for line in plan.splitlines():
        if "Filter" in line and "sequence(" in line:
            raise AssertionError(f"inferred generator filter: {line[:200]}")


def test_no_inferred_filter_duplicates_expensive_generators(spark, sf_dir):
    """Round-5 perf property, generalized: no query plan may contain a
    Filter that re-evaluates an Arrow UDF's or a tokenize tree's
    producing expression below its Generate (InferFiltersFromGenerate
    poison — it doubled the corpus shingle pass in contamination_check
    and the tokenize pass in repetition_stats). Outer explodes + output
    -attribute null filters keep these plans single-evaluation."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    for name in [
        "contamination_check",
        "minhash_lsh_dedup",
        "token_rarity",
        "repetition_stats",
        "heavy_hitters_tokens",
        "similarity_fallback_join",
    ]:
        plan = plan_of(spark, sf_dir, name)
        release_caches()
        for line in plan.splitlines():
            if "Filter" not in line and "FileScan" not in line:
                continue
            assert "pythonUDF" not in line, f"{name}: UDF in Filter: {line[:160]}"
            assert not ("size(filter(split(" in line), (
                f"{name}: tokenize tree in Filter: {line[:160]}"
            )
            # the interpreted _once chain (lambdafunction markers) must
            # never be substituted into a pushed-down predicate — the
            # similarity join's block-key isnotnull did exactly that
            # before its Generate barrier (round 5)
            assert "lambdafunction" not in line, (
                f"{name}: _once chain in Filter/Scan: {line[:160]}"
            )


def test_contamination_single_arrow_pass_per_side(spark, sf_dir):
    """The corpus and benchmark sides each shingle EXACTLY once: two
    ArrowEvalPython stages in the whole plan (round-4's inner explode
    had four — a second full corpus pass for the inferred filter)."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    plan = plan_of(spark, sf_dir, "contamination_check")
    release_caches()
    assert plan.count("ArrowEvalPython") == 2, plan.count("ArrowEvalPython")


def test_segment_dedup_single_segmentation_pass(spark, sf_dir):
    """Round-5 scale properties of the passage dedup: the exploded
    segment relation is persisted and feeds BOTH the frequency count
    and the mark join (InMemoryTableScan reached twice — the
    segmentation HOF runs once per row, not per consumer); no
    cartesian; no inferred filter re-running the segmentation below
    the Generate."""
    plan = plan_of(spark, sf_dir, "segment_dedup")
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    assert plan.count("InMemoryTableScan") >= 2, "exploded relation must be reused"
    assert "CartesianProduct" not in plan
    # the segmentation (transform over sequence) appears in the cached
    # relation's build only — never duplicated into a Filter
    for line in plan.splitlines():
        if "Filter" in line and "transform(" in line:
            raise AssertionError(f"segmentation leaked into a filter: {line[:200]}")


def test_quality_sampling_window_over_histogram_only(spark, sf_dir):
    """Round-5 scale property of the quantile sampler: the global-order
    window (the quantile prefix sum) runs over the score HISTOGRAM —
    every SinglePartition exchange sits above the histogram aggregate
    (per-score rows), never over corpus-scale data — and the bucket
    map joins back as a broadcast, not a shuffle."""
    plan = plan_of(spark, sf_dir, "quality_sampling")
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    assert "BroadcastHashJoin" in plan, "bucket map must broadcast"
    # the scored relation is persisted; the single-partition window
    # input must come from the histogram aggregate over its cache, so
    # every SinglePartition exchange has an aggregate between itself
    # and any table scan
    lines = plan.splitlines()
    sp = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert sp, "expected the histogram prefix-sum exchange"
    for i in sp:
        below = "\n".join(lines[i:])
        agg_pos = below.find("HashAggregate")
        scan_pos = below.find("InMemoryTableScan")
        assert agg_pos != -1 and (scan_pos == -1 or agg_pos < scan_pos), (
            "SinglePartition exchange must sit over the histogram "
            "aggregate, not raw corpus rows"
        )


def test_tfidf_no_cartesian_and_partitioned_window(spark, sf_dir):
    """Both keyword legs' only cross joins are broadcast 1-row
    aggregates — tfidf's N plus the r9 BM25 leg's N and Σdl — and the
    rank windows are partitioned by document (never a global sort)."""
    plan = plan_of(spark, sf_dir, "tfidf_topk")
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan, "1-row N joins as broadcast"
    assert "Exchange SinglePartition" not in plan or plan.count(
        "Exchange SinglePartition"
    ) <= 1, (
        "only the suite's ONE combined totals aggregate (N + Σtokens) "
        "may single-partition — a second one means a rank window went "
        "global"
    )
    assert "partial_count" in plan or "HashAggregate" in plan


def test_distance_tail_windows_are_cluster_partitioned(spark, sf_dir):
    """The distance-tail prune's two windows (row_number rank, count)
    both partition by cluster — never a global sort or an unbounded
    single-partition stage — and the whitened composition keeps the
    same shape plus exactly one projection kernel thanks to the
    persist barrier."""
    for name in ("prototype_pruning", "pca_whiten_curation"):
        plan = plan_of(spark, sf_dir, name)
        from dbd_datawarehouse_scraper_spark.caching import release_caches

        release_caches()
        assert "CartesianProduct" not in plan, name
        assert "Exchange SinglePartition" not in plan, name
        # every windowspecdefinition is anchored on the cluster column
        import re

        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, name
        for s in specs:
            assert s.startswith("cluster#"), (name, s)


def test_sql_frontend_exists_legs_become_semi_anti_joins(spark, sf_dir):
    """The correlated EXISTS / NOT EXISTS translations must plan as
    left-semi / left-anti joins (Catalyst's subquery decorrelation) —
    never a per-row subquery re-execution or a cartesian."""
    plan = plan_of(spark, sf_dir, "sql_frontend_suite")
    assert "LeftSemi" in plan, plan[:800]
    assert "LeftAnti" in plan, plan[:800]
    assert "CartesianProduct" not in plan


def test_curation_html_gate_strips_once(spark):
    """Round-7 perf property: with BOTH the visible-ratio gate and
    strip enabled, the ~35-step strip_html regexp chain is evaluated
    ONCE per row — behind an explode_outer(array(...)) Generate
    barrier the gate and the projection both reference. A plain
    withColumn+filter would let PushDownPredicates substitute the
    alias into the pushed filter and run the chain twice. The 'lsquo'
    entity pattern is a unique per-evaluation marker; explode_outer
    (not explode) keeps InferFiltersFromGenerate from cloning the
    chain into an inferred size()>0 filter."""
    from dbd_datawarehouse_scraper_spark.plans.curation import curate_documents

    docs = spark.createDataFrame(
        [(1, "<p>quick brown fox jumps over the lazy dog</p>")],
        "doc_id long, text string",
    )
    out = curate_documents(
        docs,
        keep_langs=("en", "und"),
        min_quality=0.0,
        min_tokens=1,
        sample_fractions=None,
        html_opts={"strip": True, "min_visible_ratio": 0.1},
    )
    qe = out._jdf.queryExecution()
    for plan in (qe.optimizedPlan().toString(), qe.executedPlan().toString()):
        assert plan.count("lsquo") == 1, plan.count("lsquo")
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()


def test_no_coalesce1_local_relation_writes():
    """Round-7 perf tripwire: tiny driver-local DataFrames must be
    written via repartition(1), never coalesce(1). coalesce(1) folds
    the local relation's defaultParallelism seed slices into one task
    that evaluates them SEQUENTIALLY at a fixed per-slice Python-eval
    cost (~0.15 s/slice on local[32] — ~5 s to write an 8-row marker,
    scaling with core count); repartition(1) evaluates them in
    parallel and shuffles <1 KB (measured ~0.3 s). Rationale comment
    at streaming/near_dedup.py's marker write."""
    import pathlib

    pkg = pathlib.Path(
        __file__
    ).resolve().parent.parent / "dbd_datawarehouse_scraper_spark"
    offenders = [
        str(p)
        for p in pkg.rglob("*.py")
        if ".coalesce(1).write" in p.read_text(encoding="utf-8")
    ]
    assert offenders == [], offenders


def test_c4_clean_sweeps_once(spark):
    """Round-7 perf property: c4_clean evaluates the line sweep
    (split + terminal/word-count/javascript lambda + array_join) ONCE
    per row — behind the explode_outer(array(...)) Generate barrier.
    A plain withColumn+filter lets PushDownPredicates substitute the
    alias into the pushed filter and run the sweep twice (confirmed
    in the round-7 review by dumping the collapsed plan). The
    'javascript' literal is the unique per-evaluation marker."""
    from dbd_datawarehouse_scraper_spark.functions.c4 import c4_clean

    docs = spark.createDataFrame(
        [(1, "This line is long enough to survive the sweep.")],
        "doc_id long, text string",
    )
    out = c4_clean(docs, min_sentences=1)
    qe = out._jdf.queryExecution()
    for plan in (qe.optimizedPlan().toString(), qe.executedPlan().toString()):
        assert plan.lower().count("javascript") == 1, plan


def test_minhash_pair_plan_never_broadcasts_corpus_sides(spark, sf_dir):
    """Round-8 sf1-smoke regression: Catalyst's static size estimate
    scales a Project by row-width ratio but does not multiply through
    a Generate, so the narrow (id, hash) projection of the exploded
    shingle index was estimated at ~1% of its source scan and
    compile-time BROADCAST — a 54M-row build side OOM'd the 600k-doc
    export ("Not enough memory to build and broadcast"). Every join
    side in minhash_lsh_pairs' verification leg is corpus-sized and
    now carries a merge (sort-merge) hint — SMJ spills gracefully
    where a shuffled-hash build map OOMs a task's memory share (the
    smoke's second failure mode); the static plan must contain NO
    BroadcastHashJoin."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    release_caches()
    assert "BroadcastHashJoin" not in plan, plan[:2000]


def test_ngram_and_simhash_self_joins_never_broadcast(spark, sf_dir):
    """The same exchange-free-build-side hazard in the other two
    inverted-index dedups: their self-join sides come from
    cache→explode→project with no exchange, so AQE never re-plans them
    and only the explicit merge hint prevents a compile-time broadcast
    of a corpus side."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for pairs in (
        ngram_jaccard_pairs(docs, threshold=0.5),
        simhash_pairs(docs, max_hamming=3),
    ):
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        release_caches()
        assert "BroadcastHashJoin" not in plan, plan[:1500]


def test_embedding_lsh_plans_never_broadcast_corpus_sides(spark, sf_dir):
    """Same hazard, embedding side: embedding_cosine_dedup's banded
    self-join and both vector-attach joins are corpus-sized on every
    side (zero static broadcasts); cosine_topk_lsh's corpus bucket leg
    and vector attach are hinted while the PROBE side stays broadcast-
    eligible (bounded by contract)."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.similarity_search import (
        cosine_topk_lsh,
        embedding_cosine_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dd = embedding_cosine_dedup(emb, threshold=0.9, dim=64)
    plan = dd._jdf.queryExecution().executedPlan().toString()
    release_caches()
    assert "BroadcastHashJoin" not in plan, plan[:2000]

    probes = emb.filter("vec_id % 50 = 0").select(
        emb.vec_id.alias("probe_id"), emb.embedding.alias("probe_vec")
    )
    lsh = cosine_topk_lsh(probes, emb, k=5, dim=64)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    release_caches()
    # corpus sides shuffle; only probe-side broadcasts may remain
    import re

    for m in re.finditer(
        r"BroadcastHashJoin \[([^\]]*)\], \[([^\]]*)\]", plan
    ):
        assert "probe_id" in m.group(1) or "probe_id" in m.group(2), (
            m.group(0),
        )
