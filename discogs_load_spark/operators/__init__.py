"""Composable DataFrame operators: the engine's operator library.

Each operator is a function ``DataFrame -> DataFrame`` built from Spark
built-ins so Catalyst/AQE own the physical plan. Nothing here collects to the
driver; everything scales with partitions.
"""
