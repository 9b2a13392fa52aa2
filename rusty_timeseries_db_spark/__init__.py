"""rusty_timeseries_db_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of bbartling/rusty-timeseries-db
(reference, read-only snapshot), re-architected Spark-first.

Layering:
- ``session``    tuned SparkSession factory
- ``schema``     canonical schemas + ingest normalization
- ``api``        engine facade (ingest / query_by_id / FDD / overlay update)
- ``operators``  as-of join, resample/LOCF/rolling, top-k, dedup,
                 similarity search, overlay, sampling/splitting,
                 sequence packing, layout optimizer, multimodal codecs
- ``pipelines``  end-to-end training-corpus composition
- ``functions``  vector + text expression libraries
- ``sources``    TESTDATA registry, parquet/json IO
- ``streaming``  structured-streaming ingest + FDD
- ``plans``      physical-plan inspection helpers
- ``server``     stdlib HTTP adapter for the reference's warp routes
- ``sql_ext``    SQL dialect rewrites (ASOF JOIN, QUALIFY)
"""

from .api import TimeseriesEngine
from .pipelines import CorpusPipelineConfig, build_training_corpus
from .server import TelemetryHttpServer
from .session import get_spark, tune_existing
from .sql_ext import sql, sql_with_asof, sql_with_qualify

__all__ = [
    "TimeseriesEngine",
    "TelemetryHttpServer",
    "CorpusPipelineConfig",
    "build_training_corpus",
    "get_spark",
    "tune_existing",
    "sql",
    "sql_with_asof",
    "sql_with_qualify",
]
