"""Pipeline plans: the reference ETL re-expressed as pure lazy stages."""

from financial_data_pipeline_optimization_spark.plans.finance import (
    company_dim,
    extract_prices,
    load_warehouse,
    run_pipeline,
    synthetic_prices,
    transform_prices,
)

__all__ = [
    "company_dim",
    "extract_prices",
    "load_warehouse",
    "run_pipeline",
    "synthetic_prices",
    "transform_prices",
]
