"""Composed pipelines — the reference's query lifecycles as lazy
DataFrame DAGs."""

from .pipeline import match_companies, scrape_pipeline  # noqa: F401
from .curation import curate_documents, curation_gate_report  # noqa: F401
from .training_export import export_training_set  # noqa: F401
from .manifest import (  # noqa: F401
    export_manifest,
    verify_manifest,
    write_manifest,
)
