"""[EXT] Incremental link-graph epoch store: a growing deduped
(src, dst) edge relation fed by ``foreachBatch``, with on-demand
PageRank refreshes over the committed store.

The Common Crawl shape this serves: crawl shards (WAT metadata → page
links) arrive in epochs — monthly dumps, continuous fetch batches —
and the domain-rank curation signal must stay current WITHOUT
re-extracting edges from every archive ever ingested. The store keeps
exactly what rank needs (the deduped edge relation, never payloads):

- per epoch, :func:`link_graph_epoch` normalizes the batch's edges
  (distinct, null/self-loop dropped) and STRIKES them against history
  — only never-seen (src, dst) pairs land in ``edges/epoch=N``, so
  the union of committed dirs IS the deduped edge relation and the
  rank-time dedup cost never grows with re-crawled links (the same
  cross-epoch striking discipline as the near-dup signature store);
- :func:`refresh_ranks` runs the bit-deterministic integer PageRank
  (operators/graph.py) over the committed store and lands
  ``ranks/data`` plus a ``_meta`` marker carrying the as-of epoch —
  the marker is the COMMIT (written last), so a crashed refresh
  leaves a stale-but-consistent previous marker, never a torn one.
  Rank refresh is deliberately decoupled from ingest (the standard
  batch-layer cadence: rank every K epochs, not per batch);
- store integrity follows the package protocol (streaming/_store.py):
  format marker pinning the layout version, strictly-below history
  reads, checkpoint-reset-ahead refusal, epoch-suffixed
  replay-idempotent overwrites, tiered LSM-style folding
  (sources/sinks.py fold_epoch_dirs) so the history probe never
  degrades into a thousands-of-small-files scan.

Scale shape (the 100 TB story): the per-epoch work is one distinct
over the batch plus one left-anti join of the (small) batch against
the store — a key shuffle whose store side is a columnar scan of two
string columns, not the corpus. PageRank's per-round work is one
key-shuffle join + one map-side-combined sum (see operators/graph.py);
refresh cost is independent of how many epochs fed the store.

Reference analog: scraper_v2.py's resume protocol persists progress
so re-runs never refetch (scraper_v2.py:1690-1720); this store applies
the same never-redo-committed-work contract to the link graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import fs_exists
from ._store import committed_epochs_below, validate_or_init_marker

#: Bump when the edge layout changes incompatibly.
LINK_STORE_FORMAT_VERSION = 1

_MARKER_SCHEMA = "format_version INT, directed INT"
_META_SCHEMA = (
    "as_of_epoch INT, n_edges BIGINT, n_nodes BIGINT, "
    "damping INT, max_iter INT"
)


def _validate_or_init_store(spark: SparkSession, store_path: str) -> None:
    validate_or_init_marker(
        spark,
        store_path,
        _MARKER_SCHEMA,
        (LINK_STORE_FORMAT_VERSION, 1),
        "link-graph store",
        "Edges written under one layout cannot be read under another",
    )


def page_link_edges(
    pages: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
    by_domain: bool = True,
) -> DataFrame:
    """(src, dst) edges from a parsed page relation (e.g.
    ``wat_metadata_source`` output): explode the links array and key
    both ends by host (``by_domain=True`` — the Common Crawl rank
    granularity) or by full URL. Purely declarative (explode +
    regexp_extract), no shuffle; the store's epoch fold dedups."""
    host = lambda c: F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)  # noqa: E731
    src = host(F.col(url_col)) if by_domain else F.col(url_col)
    link = F.explode(F.col(links_col)).alias("_link")
    out = pages.select(src.alias("src"), link)
    dst = host(F.col("_link")) if by_domain else F.col("_link")
    return out.select("src", dst.alias("dst"))


def link_graph_epoch(
    spark: SparkSession,
    batch_edges: DataFrame,
    epoch_id: int,
    store_path: str,
    src_col: str = "src",
    dst_col: str = "dst",
    fold_store_after: int | None = 16,
) -> dict:
    """Fold one epoch's edges into the store. Normalizes (distinct;
    null endpoints and self-loops dropped — rank is undefined on
    either), strikes against every committed epoch below this one, and
    overwrites ``edges/epoch=<epoch_id>`` with only the NEW pairs —
    replay-idempotent by construction. Returns
    ``{"n_batch_edges", "n_new_edges"}``."""
    from ..sources.sinks import fold_epoch_dirs

    _validate_or_init_store(spark, store_path)
    root = f"{store_path}/edges"
    if fold_store_after is not None:
        fold_epoch_dirs(spark, root, epoch_id, min_dirs=fold_store_after)
    history_epochs = committed_epochs_below(
        spark,
        root,
        epoch_id,
        "link-graph store",
        "edges re-ingested after a wipe are struck from scratch",
    )
    edges = (
        batch_edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    n_batch = edges.count()
    if history_epochs:
        history = spark.read.parquet(
            *[f"{root}/epoch={e}" for e in history_epochs]
        )
        edges = edges.join(history, ["src", "dst"], "left_anti")
    edges.write.mode("overwrite").parquet(f"{root}/epoch={epoch_id}")
    n_new = spark.read.parquet(f"{root}/epoch={epoch_id}").count()
    return {"n_batch_edges": n_batch, "n_new_edges": n_new}


def stored_edges(spark: SparkSession, store_path: str) -> DataFrame:
    """The committed deduped edge relation (every ``epoch=K`` dir).
    Raises if the store was never initialized."""
    root = f"{store_path}/edges"
    if not fs_exists(spark, f"{store_path}/format"):
        raise ValueError(
            f"no link-graph store at {store_path} (missing format marker)"
        )
    if not fs_exists(spark, root):
        return spark.createDataFrame([], "src string, dst string")
    return spark.read.parquet(f"{root}/epoch=*")


def refresh_ranks(
    spark: SparkSession,
    store_path: str,
    damping: int = 85,
    max_iter: int = 20,
    tol_millionths: int = 1,
    seeds: DataFrame | None = None,
) -> dict:
    """Recompute PageRank over the committed store into
    ``<store>/ranks/data`` (+ ``ranks/_meta``, written LAST — the
    marker is the commit; a crash mid-refresh leaves the previous
    consistent generation's marker). Returns the meta dict. Cost is a
    function of the CURRENT graph only — independent of epoch count.
    ``seeds`` (one column of node ids) switches to the personalized /
    TrustRank walk — see ``operators.graph.pagerank``."""
    from ..caching import release_caches
    from ..operators.graph import pagerank

    edges = stored_edges(spark, store_path)
    root = f"{store_path}/edges"
    as_of = -1
    if fs_exists(spark, root):
        from ..fsutil import fs_list_names

        epochs = [
            int(n.split("=", 1)[1])
            for n in fs_list_names(spark, root)
            if n.startswith("epoch=")
        ]
        as_of = max(epochs) if epochs else -1
    ranks = pagerank(
        edges,
        damping=damping,
        max_iter=max_iter,
        tol_millionths=tol_millionths,
        seeds=seeds,
    )
    ranks.write.mode("overwrite").parquet(f"{store_path}/ranks/data")
    release_caches()
    written = spark.read.parquet(f"{store_path}/ranks/data")
    meta = {
        "as_of_epoch": int(as_of),
        "n_edges": int(edges.count()),
        "n_nodes": int(written.count()),
        "damping": int(damping),
        "max_iter": int(max_iter),
    }
    spark.createDataFrame(
        [tuple(meta[k] for k in (
            "as_of_epoch", "n_edges", "n_nodes", "damping", "max_iter"
        ))],
        _META_SCHEMA,
    ).repartition(1).write.mode("overwrite").json(f"{store_path}/ranks/_meta")
    return meta


def current_ranks(spark: SparkSession, store_path: str) -> tuple[DataFrame, dict]:
    """(ranks DataFrame, meta dict) of the last COMMITTED refresh.
    Raises if no refresh has committed (no ``ranks/_meta``)."""
    meta_path = f"{store_path}/ranks/_meta"
    if not fs_exists(spark, meta_path):
        raise ValueError(
            f"no committed rank refresh under {store_path}/ranks — run "
            "refresh_ranks first"
        )
    row = spark.read.schema(_META_SCHEMA).json(meta_path).head()
    meta = {f: row[f] for f in (
        "as_of_epoch", "n_edges", "n_nodes", "damping", "max_iter"
    )}
    return spark.read.parquet(f"{store_path}/ranks/data"), meta


def stream_link_graph(
    stream_pages: DataFrame,
    store_path: str,
    checkpoint: str,
    url_col: str = "url",
    links_col: str = "links",
    by_domain: bool = True,
    fold_store_after: int | None = 16,
    available_now: bool = True,
):
    """Start the incremental link-graph ingest over a streaming page
    relation (``url_col``, ``links_col array<string>`` — e.g. a
    ``warc_stream_source`` of WAT shards piped through the metadata
    projection). Each epoch's edges strike against history and land in
    ``edges/epoch=N``. Rank refresh stays a separate batch call
    (:func:`refresh_ranks`) on whatever cadence the pipeline wants."""
    spark = stream_pages.sparkSession
    _validate_or_init_store(spark, store_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        link_graph_epoch(
            spark,
            page_link_edges(batch_df, url_col, links_col, by_domain),
            epoch_id,
            store_path,
            fold_store_after=fold_store_after,
        )

    writer = stream_pages.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
