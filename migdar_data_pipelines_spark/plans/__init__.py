from .queries import QUERIES, query_fns, oracle_sqls  # noqa: F401
