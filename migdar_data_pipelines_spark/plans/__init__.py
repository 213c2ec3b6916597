from .queries import QUERIES, query_fns, oracle_sqls  # noqa: F401
from . import llm_queries  # noqa: F401  (registers into QUERIES)
from . import pipeline_queries  # noqa: F401  (registers into QUERIES)
