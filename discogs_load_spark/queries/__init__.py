"""Declared query surface.

Every module in this package registers queries into ``registry.REGISTRY``.
Importing :mod:`discogs_load_spark.queries` loads all of them.
"""

from . import core, dedup, events, multimodal, shred, similarity, text  # noqa: F401
from .registry import REGISTRY, oracle_sql_map, queries_map  # noqa: F401
