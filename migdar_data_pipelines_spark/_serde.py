"""Executor-independent serialization of worker-side callables.

The driver contract allows ANY caller session and environment: Python workers
are separate processes that inherit PYTHONPATH, not the driver's sys.path, so
a cloudpickle of a module-level function (or of a closure that references
module-level helpers) is serialized BY REFERENCE and makes every worker
``import migdar_data_pipelines_spark`` — which fails when the engine is used
as a loose checkout rather than an installed package.

Modules that create pandas UDFs / mapInPandas / applyInPandas callables call
``register_self_contained(__name__)`` at import time: cloudpickle then
serializes their functions by value (code + referenced globals), so executors
need only the third-party libs (pandas/numpy), never this package.
Registration is a set-add; per-task overhead is a few KB of bytecode.
"""

from __future__ import annotations

import sys


def register_self_contained(module_name: str) -> None:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[module_name])
