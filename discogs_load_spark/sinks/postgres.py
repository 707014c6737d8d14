"""Postgres sink (reference db.rs — A13 DDL init, A14 binary COPY, A15 indexes).

Three write paths, fastest first:

1. :func:`write_copy` — per-partition ``COPY ... FROM STDIN`` (text format)
   through psycopg2. The distributed analogue of the reference's
   BinaryCopyInWriter (db.rs:213-244): every *partition* opens one connection
   and streams its rows, so N partitions load in parallel — versus the
   reference's single thread with a new connection per 10k flush
   (db.rs:61,187-195). Gated behind an import-try: psycopg2 is absent in the
   build container, so this path raises a clear error there and is unit-
   tested via its row-encoding function.
2. :func:`write_jdbc` — stock Spark JDBC writer (batched INSERTs,
   ``batchsize`` rows per round trip). No extra deps; Spark's
   PostgresDialect maps ArrayType(StringType) → text[].
3. parquet (sinks/files.py) — the lake path; at 100 TB this is the primary
   sink and Postgres holds only serving-sized extracts.

DDL (A13/A15) is generated from the typed schemas — the engine's equivalent
of the reference's sql/tables/*.sql + sql/indexes.sql files.

No server in the build sandbox, so the COPY protocol is verified by
round-tripping copy_encode_row/copy_decode_row (tests/test_sinks.py); the
live end-to-end smoke for real deployments is documented in
docs/postgres_smoke.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schemas import OUTPUT_SCHEMAS

_PG_TYPES = {
    T.IntegerType(): "integer",
    T.LongType(): "bigint",
    T.StringType(): "text",
    T.DoubleType(): "double precision",
    T.BooleanType(): "boolean",
    T.TimestampType(): "timestamp",
}


def _pg_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return _pg_type(dt.elementType) + "[]"
    try:
        return _PG_TYPES[dt]
    except KeyError:
        raise ValueError(f"no Postgres mapping for Spark type {dt}") from None


def create_table_ddl(table: str, schema: T.StructType | None = None) -> str:
    """``DROP TABLE IF EXISTS; CREATE TABLE`` — full-replace load semantics
    (reference sql/tables/*.sql + db.rs:40-45)."""
    schema = schema or OUTPUT_SCHEMAS[table]
    cols = ",\n    ".join(
        f"{f.name} {_pg_type(f.dataType)}{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    )
    return f"DROP TABLE IF EXISTS {table};\nCREATE TABLE {table} (\n    {cols}\n);"


def index_ddl() -> list[str]:
    """Join-key indexes, mirroring reference sql/indexes.sql:1-16."""
    return [
        "ALTER TABLE release ADD CONSTRAINT release_pk PRIMARY KEY (id);",
        "CREATE INDEX idx_label_id ON label (id);",
        "CREATE INDEX idx_artist_id ON artist (id);",
        "CREATE INDEX idx_master_id ON master (id);",
        "CREATE INDEX idx_release_master_id ON release (master_id);",
        "CREATE INDEX idx_release_video_release_id ON release_video (release_id);",
        "CREATE INDEX idx_release_label_release_id ON release_label (release_id);",
        "CREATE INDEX idx_release_label_label_id ON release_label (label_id);",
        "CREATE INDEX idx_master_artist_master_id ON master_artist (master_id);",
        "CREATE INDEX idx_master_artist_artist_id ON master_artist (artist_id);",
    ]


def jdbc_column_types(schema: T.StructType) -> str:
    """``createTableColumnTypes`` option so the JDBC writer creates text[]
    columns instead of failing on ArrayType."""
    return ", ".join(f"{f.name} {_pg_type(f.dataType)}" for f in schema.fields)


def write_jdbc(
    df: DataFrame,
    table: str,
    url: str,
    user: str,
    password: str,
    mode: str = "overwrite",
    batchsize: int = 10000,
) -> None:
    """Batched-INSERT JDBC write. ``batchsize`` defaults to the reference's
    flush size (db.rs:18-20) but one connection per PARTITION, not per batch."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .option("createTableColumnTypes", jdbc_column_types(df.schema))
        .option("truncate", "true")
        .mode(mode)
        .save()
    )


# ---------------------------------------------------------------------------
# COPY path
# ---------------------------------------------------------------------------

def copy_encode_row(row, schema: T.StructType) -> str:
    """Encode one row in Postgres COPY text format (tab-separated, ``\\N``
    nulls, ``{...}`` array literals). Pure function → unit-testable without a
    server."""

    def esc(s: str) -> str:
        return (
            s.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )

    def arr(vals) -> str:
        inner = ",".join(
            '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"' for v in vals
        )
        return "{" + inner + "}"

    out = []
    for f, v in zip(schema.fields, row):
        if v is None:
            out.append("\\N")
        elif isinstance(f.dataType, T.ArrayType):
            out.append(esc(arr(list(v))))
        elif isinstance(v, bool):
            out.append("t" if v else "f")
        else:
            out.append(esc(str(v)))
    return "\t".join(out)


def copy_decode_row(line: str, schema: T.StructType):
    """Protocol-exact inverse of :func:`copy_encode_row`: what a Postgres
    server does with each COPY text line. Two layers, same order as the
    server: (1) COPY-format unescape per tab-separated field, (2) for
    array columns, parse the ``{...}`` literal with the array input
    function's quoting rules (db.rs:66-76 sends these as TEXT_ARRAY; the
    text-format equivalent is this literal). Exists so tests can prove the
    encoder round-trips without a live server."""

    def unescape(s: str) -> str:
        out, i = [], 0
        while i < len(s):
            c = s[i]
            if c == "\\" and i + 1 < len(s):
                n = s[i + 1]
                out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(n, n))
                i += 2
            else:
                out.append(c)
                i += 1
        return "".join(out)

    def parse_array(s: str) -> list[str]:
        assert s.startswith("{") and s.endswith("}"), s
        body = s[1:-1]
        vals, i = [], 0
        while i < len(body):
            if body[i] == ",":
                i += 1
                continue
            if body[i] == '"':
                i += 1
                cur = []
                while body[i] != '"':
                    if body[i] == "\\":
                        i += 1
                    cur.append(body[i])
                    i += 1
                i += 1  # closing quote
                vals.append("".join(cur))
            else:  # unquoted element (encoder never emits these)
                j = body.find(",", i)
                j = len(body) if j == -1 else j
                vals.append(body[i:j])
                i = j
        return vals

    out = []
    for f, raw in zip(schema.fields, line.split("\t")):
        if raw == "\\N":
            out.append(None)
            continue
        v = unescape(raw)
        if isinstance(f.dataType, T.ArrayType):
            out.append(parse_array(v))
        elif isinstance(f.dataType, T.IntegerType | T.LongType):
            out.append(int(v))
        elif isinstance(f.dataType, T.DoubleType):
            out.append(float(v))
        elif isinstance(f.dataType, T.BooleanType):
            out.append(v == "t")
        else:
            out.append(v)
    return tuple(out)


def write_copy(df: DataFrame, table: str, dsn: str) -> None:
    """Per-partition COPY load. Requires psycopg2 on the executors."""
    schema = df.schema
    cols = ", ".join(f.name for f in schema.fields)

    def load_partition(rows) -> None:
        try:
            import psycopg2  # noqa: F401
        except ImportError as e:  # pragma: no cover - absent in build env
            raise RuntimeError(
                "write_copy needs psycopg2 on executors; use write_jdbc instead"
            ) from e
        import io as _io

        import psycopg2

        buf = _io.StringIO()
        n = 0
        with psycopg2.connect(dsn) as conn, conn.cursor() as cur:
            for row in rows:
                buf.write(copy_encode_row(row, schema))
                buf.write("\n")
                n += 1
                if n % 10000 == 0:  # bound memory like the reference's batches
                    buf.seek(0)
                    cur.copy_expert(f"COPY {table} ({cols}) FROM STDIN", buf)
                    buf = _io.StringIO()
            buf.seek(0)
            if buf.getvalue():
                cur.copy_expert(f"COPY {table} ({cols}) FROM STDIN", buf)
            conn.commit()

    df.foreachPartition(load_partition)
