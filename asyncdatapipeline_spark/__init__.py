"""asyncdatapipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Go library ``rushairer/asyncdatapipeline`` (an async two-stage
collect→process batch pipeline, /root/reference/async_data_pipeline.go),
re-expressed Spark-first:

- the reference's *runtime contract* (bounded-channel pipelining, idle
  timeout, sentinel cancellation, collect/process error taxonomy, live
  metrics) lives in :mod:`asyncdatapipeline_spark.pipeline` on top of
  Structured Streaming;
- the reference's opaque ``processFunc`` slot (user-supplied transform,
  async_data_pipeline.go:69-71) is replaced by a full declarative DataFrame
  operator surface (:mod:`asyncdatapipeline_spark.queries` registry), plus
  LLM-data-pipeline operators (:mod:`asyncdatapipeline_spark.llm`).

Everything is stock PySpark — no custom Catalyst rules; Catalyst/Tungsten
pick physical strategies from declaratively-built plans.
"""

from asyncdatapipeline_spark.session import get_spark
from asyncdatapipeline_spark.config import PipelineConfig
from asyncdatapipeline_spark.errors import (
    CollectError,
    PipelineError,
    ProcessError,
    StopPipeline,
    InvalidMaxWorkersError,
)
from asyncdatapipeline_spark.pipeline import CloseReason, Pipeline
from asyncdatapipeline_spark.metrics import PipelineMetrics

__all__ = [
    "get_spark",
    "PipelineConfig",
    "Pipeline",
    "CloseReason",
    "PipelineMetrics",
    "PipelineError",
    "CollectError",
    "ProcessError",
    "StopPipeline",
    "InvalidMaxWorkersError",
]

__version__ = "0.1.0"
