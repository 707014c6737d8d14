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
