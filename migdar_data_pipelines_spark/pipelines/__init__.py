"""Pipeline layer: declarative DAG of pipelines with stage materialization.

Mirrors the reference's datapackage-pipelines orchestration
(pipeline-spec.yaml:1-45): seven pipelines, each a flow with an optional cron
and inter-pipeline ``dependencies``; handoff between pipelines is always a
materialized package on disk (SURVEY.md §3.3).
"""

from .flows import REFERENCE_PIPELINES, build_reference_graph
from .framework import Pipeline, PipelineContext, PipelineGraph

__all__ = [
    "Pipeline",
    "PipelineContext",
    "PipelineGraph",
    "REFERENCE_PIPELINES",
    "build_reference_graph",
]
