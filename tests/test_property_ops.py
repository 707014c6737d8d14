"""Property-based tests: the custom relational operators vs brute-force
Python oracles on hypothesis-generated inputs.

The fixture-based tests exercise realistic distributions; these hunt the
edges those can't reach — equal timestamps at a session gap boundary,
as-of matches exactly at the left timestamp, ranges landing on bucket
edges, single-row keys, keys with no matches at all. Each operator's
contract is restated as a ~10-line Python function and the Spark result
must equal it row-for-row.

Examples are capped low (Spark job per example) and deadlines disabled;
hypothesis still shrinks failures to minimal cases.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

EPOCH = datetime(2020, 1, 1)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (key, ts_seconds, value) triples over a tiny key/ts domain so collisions
# and boundary hits are common, not astronomically rare.
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=120),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=0,
    max_size=25,
)


def _ts(seconds: int) -> datetime:
    return EPOCH + timedelta(seconds=seconds)


@SETTINGS
@given(left_rows=rows_strategy, right_rows=rows_strategy)
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    from discogs_load_spark.operators.relational import asof_join

    # contract: right_ts unique per key — keep the max value per (key, ts)
    right_map = {}
    for k, s, v in right_rows:
        right_map[(k, s)] = max(v, right_map.get((k, s), v))
    right_rows = [(k, s, v) for (k, s), v in sorted(right_map.items())]

    left = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s, _) in enumerate(left_rows)],
        "lid int, key int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _ts(s), v) for k, s, v in right_rows],
        "key int, rts timestamp, payload int",
    )
    got = {
        r.lid: r.payload
        for r in asof_join(left, right, ["key"], "lts", "rts", ["payload"]).collect()
    }

    want = {}
    for i, (k, s, _) in enumerate(left_rows):
        cands = [(rs, v) for rk, rs, v in right_rows if rk == k and rs <= s]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@SETTINGS
@given(rows=rows_strategy, gap=st.integers(min_value=1, max_value=30))
def test_sessionize_matches_bruteforce(spark, rows, gap):
    from discogs_load_spark.operators.relational import sessionize

    df = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s, _) in enumerate(rows)],
        "eid int, key int, ts timestamp",
    )
    got = {
        (r.key, r.eid): r.session_seq
        for r in sessionize(df, ["key"], "ts", gap, order_tiebreak=["eid"]).collect()
    }

    want = {}
    by_key: dict[int, list[tuple[int, int]]] = {}
    for i, (k, s, _) in enumerate(rows):
        by_key.setdefault(k, []).append((s, i))
    for k, evs in by_key.items():
        evs.sort()
        seq, prev = 0, None
        for s, i in evs:
            if prev is None or s - prev > gap:
                seq += 1
            want[(k, i)] = seq
            prev = s
    assert got == want


@SETTINGS
@given(
    left_rows=rows_strategy,
    right_rows=rows_strategy,
    bounds=st.tuples(
        st.integers(min_value=0, max_value=20), st.integers(min_value=1, max_value=40)
    ),
)
def test_range_join_bucketized_matches_bruteforce(spark, left_rows, right_rows, bounds):
    from discogs_load_spark.operators.relational import range_join_bucketized

    lower, width = bounds
    upper = lower + width
    left = spark.createDataFrame(
        [(i, _ts(s)) for i, (_, s, _) in enumerate(left_rows)],
        "lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(j, _ts(s)) for j, (_, s, _) in enumerate(right_rows)],
        "rid int, rts timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_bucketized(left, right, "lts", "rts", lower, upper).collect()
    )
    want = sorted(
        (i, j)
        for i, (_, ls, _) in enumerate(left_rows)
        for j, (_, rs, _) in enumerate(right_rows)
        if ls + lower < rs <= ls + upper
    )
    assert got == want


@SETTINGS
@given(rows=rows_strategy)
def test_first_wins_dedup_matches_bruteforce(spark, rows):
    from discogs_load_spark.operators.relational import first_wins_dedup

    df = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s, _) in enumerate(rows)],
        "eid int, key int, ts timestamp",
    )
    got = sorted(
        (r.key, r.eid)
        for r in first_wins_dedup(df, ["key"], [F.col("ts"), F.col("eid")]).collect()
    )
    want_map = {}
    for i, (k, s, _) in enumerate(rows):
        cur = want_map.get(k)
        if cur is None or (s, i) < cur:
            want_map[k] = (s, i)
    want = sorted((k, i) for k, (_, i) in want_map.items())
    assert got == want


# short docs over a 6-word vocabulary: near-dups and shared shingles are
# the norm, so the prefix-filter candidate logic is genuinely stressed.
docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=3,
        max_size=8,
    ),
    min_size=0,
    max_size=10,
)


@SETTINGS
@given(docs=docs_strategy, threshold=st.sampled_from([0.5, 0.7, 0.9]))
def test_prefix_filter_jaccard_matches_bruteforce(spark, docs, threshold):
    from discogs_load_spark.operators.dedup import prefix_filter_jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id int, text string",
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=threshold
        ).collect()
    )

    def shingles(words: list[str]) -> set[str]:
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    want = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = shingles(docs[a]), shingles(docs[b])
            if not sa or not sb:
                continue
            jacc = len(sa & sb) / len(sa | sb)
            if jacc >= threshold:
                want.append((a, b))
    assert got == sorted(want)


@SETTINGS
@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    size_stride=st.tuples(
        st.integers(min_value=2, max_value=20), st.integers(min_value=1, max_value=20)
    ),
)
def test_chunk_layout_matches_bruteforce(spark, n_tokens, size_stride):
    """chunk_documents' window formula (1 + ceil(max(0, n-size)/stride))
    vs a brute-force layout: every token covered, the final window reaches
    the end, no start beyond coverage, per-chunk token counts exact."""
    from discogs_load_spark.operators.chunking import chunk_documents

    size, stride = size_stride
    words = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    got = {
        r.chunk_id: r.n_chunk_tokens
        for r in chunk_documents(df, "doc_id", "text", size, stride).collect()
    }

    n = len(words)
    want_starts = [0]
    while want_starts[-1] + size < n:
        want_starts.append(want_starts[-1] + stride)
    want = {
        i: min(size, n - s) if s < n else 0
        for i, s in enumerate(want_starts)
    }
    assert got == want
