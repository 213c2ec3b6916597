"""Sinks: K1 package dump / K10 printer / K11 checkpoint (package.py), the
K3-K6 Elasticsearch suite (es.py), the K2 SQL upsert (jdbc.py), and its
lakehouse MERGE form (lakehouse.py). See SURVEY.md §2.2."""

from .es import (
    ES_RESERVED,
    EsSink,
    collate,
    es_dumper,
    es_mapping,
    merge_create_timestamps,
    revision_gc_queries,
    stamp_es_fields,
)
from .lakehouse import LakehouseTable, lakehouse_merge_sql, run_catalog_merge
from .package import checkpoint, dump_to_path, fingerprint, printer

__all__ = [
    "LakehouseTable",
    "lakehouse_merge_sql",
    "run_catalog_merge",
    "ES_RESERVED",
    "EsSink",
    "collate",
    "es_dumper",
    "es_mapping",
    "merge_create_timestamps",
    "revision_gc_queries",
    "stamp_es_fields",
    "checkpoint",
    "dump_to_path",
    "fingerprint",
    "printer",
]
