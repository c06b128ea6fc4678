"""financial_data_pipeline_optimization_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Catalyst /
Structured Streaming) engine with the query and data-processing surface
of the reference pipeline ``Kingsley-amg/financial_data_pipeline_optimization``
(an Extract→Transform→Load stock-market pipeline; see SURVEY.md), extended
with a full relational query layer and LLM-data-pipeline operators
(deduplication, similarity search, multimodal plumbing, text analysis).

Design rules (SURVEY.md §4.4, §7):

- Every operator is a lazy ``DataFrame -> DataFrame`` function; actions
  happen only at sinks and assertions. Catalyst/Tungsten/AQE do the
  physical planning.
- No driver-side collection in operator hot paths (no ``collect`` /
  ``toPandas``); broadcast only bounded dimension tables.
- Explicit schemas everywhere (no production ``inferSchema``).
- Built-in ``pyspark.sql.functions`` first; Arrow-batched Pandas UDFs
  only where built-ins cannot express the semantics; never row-at-a-time
  Python UDFs in a hot path.
- Designed for 100 TB / multi-executor scale, tested on ``local[N]``:
  partition-aware writes, broadcastable dims, salted/AQE-handled skew.
"""

__version__ = "0.1.0"

from financial_data_pipeline_optimization_spark.diagnostics import plan_report
from financial_data_pipeline_optimization_spark.session import get_spark

__all__ = ["get_spark", "plan_report", "__version__"]
