"""dbd_datawarehouse_scraper_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``julsukont1616/dbd-datawarehouse-scraper`` (a single-file batch ETL
pipeline: ingest company lists, fuzzy entity-match against a remote
registry, extract wide financial tables, unpivot to a long fact table,
fault-tolerant batched sinks), re-expressed Spark-first:

- DataFrame / Spark SQL declares the logical plan; Catalyst + Tungsten
  pick the physical strategy.
- Per-row web extraction is a ``mapInPandas`` source with an injectable
  fetcher (network-free in tests).
- Sinks are Parquet; incremental processing is Structured Streaming.
- Beyond reference parity, the engine ships LLM-data-pipeline operators
  (dedup, similarity search, multimodal columns, text analysis) designed
  for 100 TB scale.

Layout:
    functions/   pure column expressions (string normalization, parsing,
                 similarity, text analytics, vector math)
    operators/   relational operators (filters, dedup, joins, windows,
                 unpivot, similarity search)
    sources/     file sources (csv/text/excel/parquet), the fetch UDF
                 source, sinks (batched, side-output, combine)
    plans/       composed pipelines (the reference's E1/E2/E3 lifecycles)
    streaming/   Structured Streaming analogs (micro-batch, checkpoint,
                 event-time windows)
    multimodal/  binary-column plumbing for image/audio/video payloads
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
