"""carto_etl_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of CartoDB/carto-etl, re-expressed Spark-first.

The reference (/root/reference, carto-etl v1.0.1) is a client-side CSV -> SQL-DML
generator that delegates execution to PostgreSQL/PostGIS.  This engine absorbs both
tiers natively:

- Tier A (local in the reference): CSV ingest + header normalization, typed value
  coercion (locale floats, dual-format dates, NULL rules), geometry construction,
  micro-batch chunking, retry/observer, keyed update/delete  ->  DataFrame plans.
- Tier B (delegated to PostGIS in the reference): join/filter execution, st_* point
  functions, overview (LOD) aggregation, geocoding  ->  Spark SQL + column math.

Plus the LLM-data-pipeline operator set (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.
"""

from carto_etl_spark.config import JobConfig
from carto_etl_spark.session import get_spark
from carto_etl_spark.operators.jobs import InsertJob, UpdateJob, DeleteJob
from carto_etl_spark.operators.pipeline import (
    PipelineConfig,
    PipelineResult,
    ccnet_pipeline,
    e2e_pipeline,
    fineweb_pipeline,
)

__version__ = "0.1.0"

__all__ = [
    "JobConfig",
    "get_spark",
    "InsertJob",
    "UpdateJob",
    "DeleteJob",
    "PipelineConfig",
    "PipelineResult",
    "ccnet_pipeline",
    "e2e_pipeline",
    "fineweb_pipeline",
]
