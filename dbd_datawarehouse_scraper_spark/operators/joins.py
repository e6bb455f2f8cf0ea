"""The matching engine: join operators (SURVEY §2.3).

The reference's per-company search/match loop (scraper_v2.py:997-1067)
decomposes into declarative joins:

- ``exact_core_join``: equi-join on the derived core-name key.
- ``strategy_ranked_first_match``: all (rank, term) pairs join at once;
  a window picks the lowest rank per company — set-semantics equivalent
  of the reference's sequential early-exit loop.
- ``similarity_fallback_join``: blocked fuzzy join (block on the first
  core token, scraper_v2.py:1034-1035), token-Jaccard score, top-1,
  threshold gate. Blocking bounds the candidate cross-product; the
  unblocked form is a cross join and is never acceptable at scale.
- ``anti_join_not_found``: the not-found side output.
- ``existing_reg_split``: rows that already carry a reg number bypass
  the search subtree entirely (scraper_v2.py:1472-1477).

Scale notes: the candidate/search-result side is joined with
``broadcast()`` when small; otherwise both sides shuffle on the join
key. The first-token block key is skew-prone (common first words);
AQE skew-join handles it, and ``salt`` can be added for pathological
corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import token_jaccard, tokenize_ws
from ..functions.text_norm import _core_key_cached, add_core_name
from .skew import salted_join
from .windows import top1_per_group


def exact_core_join(
    targets: DataFrame,
    candidates: DataFrame,
    target_name: str = "company_name",
    cand_name: str = "cand_text",
    broadcast_candidates: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Equi-join on ``extract_core_name`` of both sides
    (scraper_v2.py:970-972): target core == candidate core, empty keys
    never match (the reference compares non-empty page lines). The key
    is derived by size signal: ``persist=False`` (small one-shot
    inputs) uses the single-evaluation column chain with empty keys
    mapped to NULL, so the inner join itself drops them — no filter to
    push through the projection, no Python workers, no barriers;
    ``persist=True`` (big pipeline legs) uses the Arrow kernel + a
    tracked cache barrier via ``add_core_name`` (see its docstring for
    the break-even)."""
    if persist:
        t = add_core_name(targets, target_name, "_core_key", persist=True)
        c = add_core_name(candidates, cand_name, "_core_key", persist=True)
        t = t.filter(F.col("_core_key") != "")
        c = c.filter(F.col("_core_key") != "")
    else:
        # explode(array(key)) emits exactly one row (a [NULL] array
        # explodes to a NULL element) but interposes a Generate node:
        # the isnotnull(_core_key) filter Catalyst infers from the
        # inner join then stays ABOVE the key projection as a cheap
        # attribute test instead of being pushed through it with the
        # whole chain substituted in — one chain evaluation per row
        # per side, verified in the plan.
        t = targets.select(
            "*",
            F.explode(F.array(_core_key_cached(target_name))).alias("_core_key"),
        )
        c = candidates.select(
            "*",
            F.explode(F.array(_core_key_cached(cand_name))).alias("_core_key"),
        )
    if broadcast_candidates:
        c = F.broadcast(c)
    return t.join(c, "_core_key", "inner").drop("_core_key")


def strategy_ranked_first_match(
    matches: DataFrame,
    key_col: str = "company_name",
    rank_col: str = "strategy_rank",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """FIRST search term (lowest 1-based rank) that produced a match wins
    (scraper_v2.py:1019-1028). The reference's sequential early-exit is
    an optimization, not a semantic: joining every rank and keeping
    ``min(rank)`` yields the same winner."""
    order = [F.col(rank_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    return top1_per_group(matches, [key_col], order)


def similarity_fallback_join(
    unmatched: DataFrame,
    candidates: DataFrame,
    threshold: float,
    target_name: str = "company_name",
    cand_name: str = "cand_text",
    sim_col: str = "sim",
    tiebreak_cols: tuple[str, ...] = (),
    persist: bool = True,
    n_salts: int | str = 1,
    target_block_rows: int = 100_000,
) -> DataFrame:
    """Blocked fuzzy join for companies with no exact hit
    (scraper_v2.py:1030-1067):

    1. block key = first token of the core name (both sides) — the
       reference searches with just the first token and scores what
       comes back (:1034-1035);
    2. score = token Jaccard of core-name token sets (:1045-1052);
    3. best candidate per company, deterministic tiebreak (:1057-1059);
    4. threshold gate (:1062-1067).

    The first-token block key is this engine's one acknowledged skew
    risk: one common first word ("บริษัท"-like tokens survive core-name
    stripping in degenerate corpora) can put most of the candidate side
    on a single reducer. ``n_salts > 1`` spreads it: the candidate
    (large) side gets a deterministic xxhash64 salt, the unmatched
    (small) side is replicated n_salts×, and the join key becomes
    (block, salt) — identical results (every qualifying pair still
    meets exactly once), per-reducer candidate rows bounded by
    hot_key_rows / n_salts. Leave at 1 when AQE's runtime skew split is
    enough; salt when a known-degenerate corpus needs a static bound.
    ``n_salts="auto"`` sizes the salt from the data instead of caller
    guesswork: an exact map-side-combined frequency probe of the
    candidate side's block key picks
    ``ceil(hottest_block_rows / target_block_rows)`` (skew.py
    auto_salt_count), so the hot block's per-reducer rows are bounded
    at ~``target_block_rows`` whatever the corpus looks like.
    """
    # The token arrays go through an explode_outer(array(...)) Generate
    # barrier: `_block`'s isnotnull filter (explicit here, and inferred
    # again by the join) would otherwise be PUSHED below the projection
    # with the whole core-name chain substituted — the interpreted
    # chain evaluated twice per row per side (round-5 plan audit; the
    # same mechanism exact_core_join guards against). Above the
    # Generate the filters reference its output attribute, which
    # cannot be pushed below it. array(x) is never empty, so outer is
    # row-identical to the plain projection.
    def _with_tokens(df, name_col, core_col, toks_col):
        cored = add_core_name(df, name_col, core_col, persist=persist)
        return (
            cored.select(
                "*", F.explode_outer(F.array(tokenize_ws(F.col(core_col)))).alias(toks_col)
            )
            .withColumn("_block", F.element_at(F.col(toks_col), 1))
            .filter(F.col("_block").isNotNull())
        )

    t = _with_tokens(unmatched, target_name, "_core", "_toks")
    c = _with_tokens(candidates, cand_name, "_ccore", "_ctoks")
    if n_salts == "auto":
        from .skew import auto_salt_count

        n_salts = auto_salt_count(c, "_block", target_block_rows)
    if n_salts > 1:
        joined = salted_join(c, t, "_block", n_salts=n_salts)
    else:
        joined = t.join(c, "_block")
    scored = joined.withColumn(
        sim_col, token_jaccard(F.col("_toks"), F.col("_ctoks"))
    ).drop("_block", "_core", "_toks", "_ccore", "_ctoks")
    order = [F.col(sim_col).desc()] + [F.col(col).asc() for col in tiebreak_cols]
    best = top1_per_group(scored, [target_name], order)
    return best.filter(F.col(sim_col) >= F.lit(threshold))


def anti_join_not_found(
    inputs: DataFrame,
    matched: DataFrame,
    key_col: str = "company_name",
    reason: str = "No search results",
) -> DataFrame:
    """Companies with no match anywhere → side output with a reason
    (scraper_v2.py:1481-1484)."""
    return inputs.join(matched.select(key_col), key_col, "left_anti").withColumn(
        "reason", F.lit(reason)
    )


def existing_reg_split(
    df: DataFrame, reg_col: str = "registration_number"
) -> tuple[DataFrame, DataFrame]:
    """(has_reg, needs_search): rows with a validated reg number skip the
    whole search subtree (scraper_v2.py:1472-1477) — Catalyst prunes the
    unused branch for each split."""
    has = df.filter(F.col(reg_col).isNotNull())
    needs = df.filter(F.col(reg_col).isNull())
    return has, needs


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    direction: str = "backward",
) -> DataFrame:
    """As-of join ([EXT]; Spark has no native ASOF JOIN).

    Directions (equality always matches, as in DuckDB ASOF):

    - ``backward``: latest right row with ``right_ts <= left_ts``;
    - ``forward``: earliest right row with ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two candidates has the smaller
      ``|left_ts - right_ts|``, ties preferring backward. Requires a
      numeric ts column (epoch millis/micros) — timestamp subtraction
      yields intervals, so cast first.

    Implementation is the union+window trick — tag both sides, sort by
    (key, ts, side) with right rows winning ties in the match
    direction, and carry the adjacent right payload across — ONE
    shuffle on the key, no per-key Python, no range cross-product
    (``nearest`` adds a second sort over the same exchange, not a
    second shuffle). This beats ``applyInPandas`` + ``pd.merge_asof``
    at scale (no Arrow transfer, stays in Tungsten); use the pandas
    form only when per-group logic grows beyond as-of.

    The right side must be unique per (key, right_ts) — dedup first
    (e.g. ``min_by``) or the carried payload is ambiguous.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # payload carries right_ts too: nearest needs both candidate
    # distances, and it rides along free for the other directions
    r_payload = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_payload.alias("_r"),
    )
    l_cols = left.columns
    unioned = l_tagged.select(
        *l_cols, "_side", "_ts", F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r")
    ).unionByName(
        r_tagged.select(
            *[
                F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in l_cols
            ],
            "_side",
            "_ts",
            "_r",
        )
    )
    # backward: ascending scan, right rows (side 0) sort before left at
    # equal ts so an equal-ts right row is inside the frame.
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: DESCENDING scan — "last non-null up to current" is then
    # the smallest right_ts >= left_ts; right still first on ties.
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        matched = unioned.withColumn("_pick", F.last("_r", ignorenulls=True).over(wb))
    elif direction == "forward":
        matched = unioned.withColumn("_pick", F.last("_r", ignorenulls=True).over(wf))
    else:  # nearest
        matched = (
            unioned.withColumn("_b", F.last("_r", ignorenulls=True).over(wb))
            .withColumn("_f", F.last("_r", ignorenulls=True).over(wf))
            .withColumn(
                "_pick",
                F.when(F.col("_b").isNull(), F.col("_f"))
                .when(F.col("_f").isNull(), F.col("_b"))
                .when(
                    (F.col("_ts") - F.col("_b._rts"))
                    <= (F.col("_f._rts") - F.col("_ts")),
                    F.col("_b"),
                )
                .otherwise(F.col("_f")),
            )
        )
    out = matched.filter(F.col("_side") == 1).select(
        *l_cols, *[F.col(f"_pick.{c}").alias(f"asof_{c}") for c in right_cols]
    )
    return out
