"""Benchmark harness: runs the declared query suite (and an XML-ingest
microbench) at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]; prints ONE
JSON line.

Each query is forced through a noop sink (full materialization — a bare
count() would let Catalyst prune the computed columns and flatter the
numbers). The XML-ingest bench generates a synthetic releases dump once,
then measures parse→shred→materialize rows/sec, the figure comparable to the
reference's ~16.6k releases/s single-thread baseline (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

XML_BENCH_RELEASES = int(os.environ.get("SPARK_GRAFT_XML_ROWS", "240000"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


XML_BENCH_SHARDS = int(os.environ.get("SPARK_GRAFT_XML_SHARDS", "32"))


def _gen_releases_xml(shard_dir: Path, n: int, shards: int) -> None:
    """Synthetic releases dump, reference-shaped (~0.5 KB/record), written
    as N shards — the layout a real 10 GB dump should use so parse tasks
    parallelize (one gzip file = one task; see ARCHITECTURE.md)."""
    genres = ["Electronic", "House", "Rock", "Jazz", "Ambient"]
    shard_dir.mkdir(parents=True, exist_ok=True)
    per = n // shards
    for s in range(shards):
        with open(shard_dir / f"part-{s}.xml", "w") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n<releases>\n')
            for i in range(s * per + 1, (s + 1) * per + 1):
                g = genres[i % 5]
                f.write(
                    f'<release id="{i}" status="Accepted"><title>Title {i} &amp; co</title>'
                    f"<country>US</country><released>19{90 + i % 10}-01-0{1 + i % 9}</released>"
                    f"<notes>Synthetic record {i} for ingest benchmarking.</notes>"
                    f"<master_id>{i // 3}</master_id><data_quality>Correct</data_quality>"
                    f"<genres><genre>{g}</genre></genres><styles><style>Deep</style></styles>"
                    f'<labels><label name="Label {i % 997}" catno="C-{i}" id="{i % 997}"/></labels>'
                    f'<videos><video src="https://example.test/v/{i}" duration="{60 + i % 300}">'
                    f"<title>Video {i}</title></video></videos></release>\n"
                )
            f.write("</releases>\n")


def bench_xml_ingest(spark) -> dict:
    from discogs_load_spark.operators.shred import shred
    from discogs_load_spark.sources.xml_source import read_dump

    shard_dir = Path("/tmp") / f"bench_releases_{XML_BENCH_RELEASES}_{XML_BENCH_SHARDS}"
    if not shard_dir.exists():
        _gen_releases_xml(shard_dir, XML_BENCH_RELEASES, XML_BENCH_SHARDS)

    def one_pass() -> float:
        t0 = time.monotonic()
        raw = read_dump(spark, str(shard_dir), "releases").persist()
        tables = shred(raw, "releases")
        for df in tables.values():
            _materialize(df)
        raw.unpersist()
        return time.monotonic() - t0

    cold = one_pass()  # includes parser-path JIT + page-cache fill
    # steady-state throughput, the comparable figure; min of three passes —
    # a single warm pass occasionally lands on a GC cycle and reads 2-3x
    # slow (observed 7.0 s vs 2.4 s for the same work; min-of-two still
    # varied ~2x across bench invocations)
    warm = min(one_pass(), one_pass(), one_pass())
    n = XML_BENCH_RELEASES // XML_BENCH_SHARDS * XML_BENCH_SHARDS
    return {
        "seconds": round(warm, 3),
        "cold_seconds": round(cold, 3),
        "rows": n,
        "rows_per_sec": round(n / warm, 1),
        "cold_rows_per_sec": round(n / cold, 1),
        "shards": XML_BENCH_SHARDS,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from discogs_load_spark.queries import REGISTRY
    from discogs_load_spark.session import get_spark

    spark = get_spark(app_name="discogs_load_spark_bench")
    # Warm the one-time paths so per-query timings measure the engine, not
    # startup: JVM/codegen/noop sink, the fixture re-shard cache + page
    # cache (load_tables), and the Python worker pool (first Pandas-UDF
    # call forks N workers that each import pandas).
    spark.range(1000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()
    from discogs_load_spark.session import load_tables

    for df in load_tables(spark, sf_dir).values():
        _materialize(df)
    import pandas as pd  # noqa: F401 — fail fast if absent

    warm = spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    _materialize(warm.mapInPandas(lambda it: it, "id long"))

    # ingest microbench first: measured on a young JVM for run-to-run
    # comparability (after ~60 queries the session carries listener/GC
    # baggage that penalized whichever bench ran last)
    ingest = bench_xml_ingest(spark)

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        t0 = time.monotonic()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    total = round(sum(timings.values()), 3)

    # Full per-query timings go to stderr AND to their own stdout line
    # BEFORE the result line: the driver keeps only the tail of stdout
    # (~2 KB) and parses the LAST line as JSON, so an earlier long line is
    # harmlessly truncated away while the humans and the sidecar file keep
    # the full map.
    print(json.dumps({"per_query_full": timings}), file=sys.stderr)
    sys.stdout.flush()
    print(json.dumps({"per_query_full": timings}, separators=(",", ":")), flush=True)

    # The FINAL line must stay well under the driver's ~2 KB tail capture —
    # at 162 registered queries even qNN-keyed 2-decimal timings overflowed
    # it and BENCH_r03.parsed came back null. Inline only the TOP_N slowest
    # queries (the ones a perf reader acts on; the full map is one line up)
    # and keep the rest of the payload scalar.
    TOP_N = 25
    short = {n.split("_", 1)[0]: round(t, 2) for n, t in timings.items()}
    if len(short) != len(timings):  # qNN prefix collision — use full names
        short = {n: round(t, 2) for n, t in timings.items()}
    slowest = dict(sorted(short.items(), key=lambda kv: -kv[1])[:TOP_N])
    payload = {
        "metric": "declared_query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "queries_note": f"top {TOP_N} slowest; full map on previous line",
        "sf": sf,
        "n_queries": len(timings),
        "xml_ingest": ingest,
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) >= 1500:  # never let the headline line outgrow the tail
        payload.pop("queries")
        payload["queries_note"] = "full map on previous line"
        line = json.dumps(payload, separators=(",", ":"))
    print(line, flush=True)


if __name__ == "__main__":
    main()
