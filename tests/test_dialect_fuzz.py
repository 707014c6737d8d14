"""Differential fuzz over the dual-dialect expression builders.

The oracle-parity tests check the fixtures; this one feeds adversarial
random strings (empty, whitespace runs, punctuation soup, digits, long
repeats, mixed case) through every Spark/DuckDB expression pair in ONE
vectorized job per engine and requires byte-identical results. Any drift
between the dialects' regex/string/hash semantics shows up here before it
costs an oracle mismatch on real data.
"""

from __future__ import annotations

import random
import string

from discogs_load_spark.functions.textfns import (
    doc_shingles_sql,
    norm_sql,
    rolling_hash_min_sql,
    token_count_sql,
    tokens_sql,
)

N_CASES = 200


def _corpus() -> list[str]:
    rng = random.Random(20260813)
    alphabet = (
        string.ascii_letters + string.digits + "     .,;:!?-_'\"()[]{}@#$%&*"
    )
    cases = [
        "",
        " ",
        "   ",
        "a",
        "ab",
        "word " * 50,
        "!!!???...",
        "1234567890",
        "a b c d e f g h",
        "\tTAB\tand  spaces ",
        "repeat" * 40,
    ]
    while len(cases) < N_CASES:
        n = rng.randint(0, 120)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    return cases


def test_text_expressions_agree_across_engines(spark, duck):
    rows = [(i, s) for i, s in enumerate(_corpus())]
    sdf = spark.createDataFrame(rows, "i long, s string")
    exprs_spark = {
        "nrm": norm_sql("s", "spark"),
        "tok": f"size({tokens_sql(norm_sql('s', 'spark'), 'spark')})",
        "sh": f"concat_ws('|', {doc_shingles_sql('s', 3, 'spark')})",
        "bpe": token_count_sql("s", "spark"),
        "rh": rolling_hash_min_sql("s", "spark"),
    }
    exprs_duck = {
        "nrm": norm_sql("s", "duckdb"),
        "tok": f"len({tokens_sql(norm_sql('s', 'duckdb'), 'duckdb')})",
        # COALESCE: duckdb's array_to_string([]) is NULL where Spark's
        # concat_ws is '' — a display-encoding artifact of this test, not
        # a builder divergence (both builders return [])
        "sh": f"COALESCE(array_to_string({doc_shingles_sql('s', 3, 'duckdb')}, '|'), '')",
        "bpe": token_count_sql("s", "duckdb"),
        "rh": rolling_hash_min_sql("s", "duckdb"),
    }
    got = {
        r["i"]: tuple(r[k] for k in exprs_spark)
        for r in sdf.selectExpr(
            "i", *[f"{e} AS {k}" for k, e in exprs_spark.items()]
        ).collect()
    }
    duck.execute("DROP TABLE IF EXISTS fuzz")
    duck.execute("CREATE TABLE fuzz (i BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO fuzz VALUES (?, ?)", rows)
    sel = ", ".join(f"{e} AS {k}" for k, e in exprs_duck.items())
    want = {
        r[0]: tuple(r[1:])
        for r in duck.execute(f"SELECT i, {sel} FROM fuzz").fetchall()
    }
    mismatches = {
        i: (got[i], want[i]) for i in want if got[i] != want[i]
    }
    assert not mismatches, f"{len(mismatches)} dialect divergences: " + str(
        dict(list(mismatches.items())[:3])
    )


def test_numeric_expressions_agree_across_engines(spark, duck):
    """dec_corr / dec_var / floordiv on adversarial numerics: magnitudes
    whose quantized per-row products exceed int64 (caught by the
    DECIMAL(38,0) widening — BIGINT*BIGINT would wrap in Spark and error
    in DuckDB), zero-variance and single-row groups (the CASE guard makes
    both engines agree on NULL), and negative dividends for the floor
    division pair (Spark `div` truncates; the helper corrects it)."""
    import random

    from discogs_load_spark.functions.numeric import (
        dec_corr_sql,
        dec_var_sql,
        floordiv_sql,
    )

    rng = random.Random(20260814)
    rows = []
    for i in range(400):
        g = i % 8
        if g == 0:  # zero-variance group: constant x
            x = 42.5
            y = rng.uniform(-10, 10)
        elif g == 1:  # huge magnitudes: quantized products overflow int64
            x = rng.uniform(-5e7, 5e7)
            y = rng.uniform(-5e7, 5e7)
        else:
            x = rng.uniform(-1000, 1000)
            y = 3.0 * x + rng.uniform(-50, 50)
        ep = rng.randint(-10**15, 10**15)  # pre- and post-1970 epochs
        rows.append((i, g, x, y, ep))
    rows.append((400, 9, 1.0, 1.0, -86400000000))  # single-row group

    sdf = spark.createDataFrame(rows, "i long, g long, x double, y double, ep long")
    s_agg = (
        sdf.groupBy("g")
        .agg(
            *[
                __import__("pyspark.sql.functions", fromlist=["expr"]).expr(e)
                for e in (
                    dec_corr_sql("x", "y", "corr_xy"),
                    dec_var_sql("x", "var_x"),
                )
            ]
        )
        .collect()
    )
    s_div = sdf.selectExpr(
        "i", f"{floordiv_sql('ep', 86400000000, 'spark')} AS day"
    ).collect()

    duck.execute("DROP TABLE IF EXISTS numfuzz")
    duck.execute(
        "CREATE TABLE numfuzz (i BIGINT, g BIGINT, x DOUBLE, y DOUBLE, ep BIGINT)"
    )
    duck.executemany("INSERT INTO numfuzz VALUES (?, ?, ?, ?, ?)", rows)
    d_agg = duck.execute(
        f"SELECT g, {dec_corr_sql('x', 'y', 'corr_xy')}, "
        f"{dec_var_sql('x', 'var_x')} FROM numfuzz GROUP BY g"
    ).fetchall()
    d_div = duck.execute(
        f"SELECT i, {floordiv_sql('ep', 86400000000, 'duckdb')} FROM numfuzz"
    ).fetchall()

    got_agg = {r["g"]: (r["corr_xy"], r["var_x"]) for r in s_agg}
    want_agg = {r[0]: (r[1], r[2]) for r in d_agg}
    assert got_agg == want_agg

    got_div = {r["i"]: r["day"] for r in s_div}
    want_div = {r[0]: r[1] for r in d_div}
    assert got_div == want_div


def test_bpe_merge_fold_agrees_with_python_reference(spark, duck):
    """Three-way differential fuzz for the BPE greedy merge fold (q171/
    q172): random symbol sequences (heavy on runs, overlaps, and the
    merged-symbol-equals-neighbor trap) merged against random pairs must
    agree byte-for-byte between the Spark ``aggregate`` fold, the DuckDB
    ``list_reduce`` fold, and a 5-line Python reference of the standard
    greedy left-to-right non-overlapping semantics. NULL merge pairs
    (the merge-less-round path) must pass sequences through unchanged."""
    import random

    from discogs_load_spark.queries.text import _SPARK_MERGE_FOLD, _duck_merge_fold

    def py_fold(seq, lhs, rhs):
        if lhs is None:
            return list(seq)
        out = []
        for x in seq:
            if out and out[-1] == lhs and x == rhs:
                out[-1] = lhs + rhs
            else:
                out.append(x)
        return out

    rng = random.Random(20260814)
    syms = ["a", "b", "ab", "aa", "c"]
    cases = [
        (["a", "a", "a", "a"], "a", "a"),   # overlap run -> [aa, aa]
        (["a", "a", "a"], "a", "a"),        # odd run -> [aa, a]
        (["a", "b", "a", "b"], "a", "b"),   # alternating -> [ab, ab]
        (["ab", "b"], "a", "b"),            # merged symbol != raw pair
        (["a", "b"], "b", "a"),             # pair absent
        (["a"], "a", "a"),                  # single symbol
        (["a", "a"], None, None),           # merge-less round passthrough
    ]
    while len(cases) < 150:
        n = rng.randint(1, 12)
        seq = [rng.choice(syms) for _ in range(n)]
        if rng.random() < 0.1:
            cases.append((seq, None, None))
        else:
            cases.append((seq, rng.choice(syms), rng.choice(syms)))
    rows = [(i, seq, lhs, rhs) for i, (seq, lhs, rhs) in enumerate(cases)]
    want = {i: py_fold(seq, lhs, rhs) for i, seq, lhs, rhs in rows}

    sdf = spark.createDataFrame(
        rows, "i long, s array<string>, m_l string, m_r string"
    )
    got_spark = {
        r["i"]: list(r["m"])
        for r in sdf.selectExpr(
            "i",
            f"{_SPARK_MERGE_FOLD.format(src='s', lhs='m_l', rhs='m_r')} AS m",
        ).collect()
    }
    assert got_spark == want

    duck.execute("DROP TABLE IF EXISTS bpe_fuzz")
    duck.execute(
        "CREATE TABLE bpe_fuzz (i BIGINT, s VARCHAR[], m_l VARCHAR, m_r VARCHAR)"
    )
    duck.executemany("INSERT INTO bpe_fuzz VALUES (?, ?, ?, ?)", rows)
    got_duck = {
        r[0]: list(r[1])
        for r in duck.execute(
            f"SELECT i, {_duck_merge_fold('s', 'm_l', 'm_r')} AS m FROM bpe_fuzz"
        ).fetchall()
    }
    assert got_duck == want
