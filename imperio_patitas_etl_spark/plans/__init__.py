"""Entity transform plans + pipeline runner (SURVEY.md §3, §7 phase 2)."""

from imperio_patitas_etl_spark.plans.entities import (  # noqa: F401
    client_spec,
    detail_spec,
    document_spec,
    product_spec,
    transform_clients,
    transform_documents,
    transform_products,
)
from imperio_patitas_etl_spark.plans.pipeline import EtlPipeline  # noqa: F401
