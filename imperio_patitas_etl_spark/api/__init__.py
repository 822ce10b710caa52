"""HTTP entry surface over the ETL pipeline (endpoints.py / scheduler_endpoints.py)."""

from imperio_patitas_etl_spark.api.http import create_app  # noqa: F401
