"""Focused oracle check: drive_contract's comparison for ONLY the query
names given on argv (substring match allowed), at sf0.01 (override with
SPARK_GRAFT_SF_DIR). Usage: python tools/check_queries.py q130 q165 q213
"""
import math
import os
import sys
import tempfile
from collections import Counter
from datetime import datetime

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SPILL = tempfile.mkdtemp(prefix="duck_spill_")


def fresh_duck():
    c = duckdb.connect()
    c.execute("SET threads=4")
    c.execute("SET memory_limit='8GB'")
    c.execute(f"SET temp_directory='{SPILL}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


qs, oracles = e.queries(), e.oracle_sql()
wanted = sys.argv[1:]
names = [n for n in sorted(qs) if any(w in n for w in wanted)]
if not names:
    print("no queries match", wanted)
    sys.exit(2)

from discogs_load_spark.queries.registry import REGISTRY as _REG  # noqa: E402

fail = 0
for name in names:
    fn = qs[name]
    guard = getattr(_REG.get(name), "oracle_guard", None)
    guard_reason = guard(spark, SF) if (guard and name in oracles) else None
    sdf = fn(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if guard_reason:
        print(f"{name}: rows-only {len(srows)} rows, SKIP-ORACLE ({guard_reason})")
        continue
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows")
        continue
    con = fresh_duck()
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    ok_names = sorted(scols) == sorted(dcols)
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = Counter(tuple(norm(r[i]) for i in sidx) for r in srows)
    dset = Counter(tuple(norm(r[i]) for i in didx) for r in drows)
    ok = ok_names and sset == dset
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
    if not ok:
        fail += 1
        print("  spark-only:", list((sset - dset).items())[:2])
        print("  duck-only:", list((dset - sset).items())[:2])
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
