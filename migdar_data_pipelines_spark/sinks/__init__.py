"""Sinks: K1 package dump / K10 printer / K11 checkpoint (package.py) and the
K3-K6 Elasticsearch suite (es.py). See SURVEY.md §2.2."""

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
from .package import checkpoint, dump_to_path, fingerprint, printer

__all__ = [
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
