"""Sources & sinks: file ingestion (csv/text/excel/parquet), the
UDF-shaped web-fetch source, and fault-tolerant sinks."""

from .files import (  # noqa: F401
    csv_companies_source,
    text_companies_source,
    excel_companies_source,
    parquet_source,
    COMPANIES_SCHEMA,
)
from .sinks import (  # noqa: F401
    batched_sink,
    side_output_sink,
    combine_batches,
    backup_on_overwrite,
)
from .http_fetch import (  # noqa: F401
    fetch_search_results,
    fetch_financial_pages,
    FakeDbdFetcher,
)
from .http_client import (  # noqa: F401
    HttpFetcher,
    SeleniumFetcher,
)
from .warc import (  # noqa: F401
    warc_source,
    warc_sink,
    wat_metadata_source,
    wat_sink,
    wet_documents_source,
)
from .layout import (  # noqa: F401
    optimize_table,
    sorted_write,
    zorder_key,
    zorder_write,
)
