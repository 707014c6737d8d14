"""SparkSession factory tuned for the engine.

Local test profile: one JVM, N threads (``local[N]``). The same settings map
onto a real cluster — AQE handles runtime re-planning (partition coalescing,
skew-join splitting), and the shuffle-partition default is meant to be
overridden per deployment (rule of thumb: 2-3x total executor cores, sized so
a shuffle partition is ~128-512 MB at the target scale).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED_APPS: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Any closure that references module-level code (mapInPandas readers,
    foreachPartition sinks) is pickled BY REFERENCE to its module, so the
    worker must be able to import ``discogs_load_spark`` — which is not
    guaranteed when the driving process imported us by path (e.g. the
    grading driver, or spark-submit without --py-files). Zipping the package
    once per application and addPyFile-ing it makes workers self-sufficient.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"discogs_load_spark_{os.getpid()}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, f"discogs_load_spark/{py.relative_to(pkg_dir)}")
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED_APPS.add(app_id)


def get_spark(
    app_name: str = "discogs_load_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    - AQE on: runtime partition coalescing + skew-join handling, so plans
      survive cardinality surprises at 100 TB without hand-tuning.
    - Arrow on: every Pandas-UDF boundary is Arrow-batched.
    - UTC session timezone: deterministic timestamp semantics (and matches
      the DuckDB oracle's UTC-naive timestamps).
    - autoBroadcastJoinThreshold stays default (10 MB); dimension tables in
      the star schema (region/nation/label/...) broadcast automatically.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the fixture parquet tables and register them as temp views.

    Returns {name: DataFrame}. Mirrors the driver's DuckDB view registration
    so SQL written against view names runs identically in both engines.
    """
    all_names = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    # The driver may hand us a session we didn't build; pin UTC so timestamp
    # semantics (date_trunc, collect) match the DuckDB oracle regardless,
    # and make sure executors can unpickle our operator closures.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ensure_package_on_executors(spark)
    out = {}
    for name in names or all_names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = _read_parquet_normalized(spark, path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def _read_parquet_normalized(spark: SparkSession, path: str):
    """Read parquet, normalizing TIMESTAMP(NANOS) columns to microseconds.

    Spark has no nanosecond timestamp type (PARQUET_TYPE_ILLEGAL on read);
    with ``spark.sql.legacy.parquet.nanosAsLong`` the raw int64 comes through
    and we truncate to micros with integer division — the same truncation
    DuckDB applies when it narrows ns → its microsecond TIMESTAMP, so both
    engines see identical values. Footer-only pyarrow peek; no data is read
    driver-side.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    footer = pq.read_schema(path)
    nanos_cols = [
        f.name
        for f in footer
        if str(f.type).startswith("timestamp[ns")
    ]
    if not nanos_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df
