"""Declared query surface.

Every module in this package registers queries into ``registry.REGISTRY``.
Importing :mod:`discogs_load_spark.queries` loads all of them.
"""

from . import (  # noqa: F401
    behavior,
    clustering,
    core,
    dedup,
    events,
    extra,
    graph,
    lake,
    multimodal,
    rag,
    sampling,
    shred,
    similarity,
    streaming,
    text,
    tpch_deep,
    udf_surface,
    warehouse,
)
from .registry import REGISTRY, oracle_sql_map, queries_map  # noqa: F401
