"""Typed schemas: nested XML input records and the 7 flat output tables.

Output tables mirror the reference DDL (sql/tables/*.sql; FIXTURES.md §2)
with the reference's three wire types only — INT4/TEXT/TEXT[] (db.rs:66-76)
→ IntegerType/StringType/ArrayType(StringType).

Input schemas describe the XML record shapes (FIXTURES.md §1). Explicit
schemas everywhere: the reference hard-codes its structs (release.rs:10-21
etc.), and schema inference on a 10 GB dump costs a full extra pass.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_STR_ARR = T.ArrayType(T.StringType())

# ---------------------------------------------------------------------------
# Output tables (engine's canonical relational schema)
# ---------------------------------------------------------------------------

RELEASE_SCHEMA = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("status", T.StringType()),
    _f("title", T.StringType()),
    _f("country", T.StringType()),
    _f("released", T.StringType()),  # date-ish TEXT ('2000', '2001-07-02')
    _f("notes", T.StringType()),
    _f("genres", _STR_ARR),
    _f("styles", _STR_ARR),
    _f("master_id", T.IntegerType()),
    _f("data_quality", T.StringType()),
])

RELEASE_LABEL_SCHEMA = T.StructType([
    _f("release_id", T.IntegerType(), False),
    _f("label", T.StringType()),
    _f("catno", T.StringType()),
    _f("label_id", T.IntegerType()),
])

RELEASE_VIDEO_SCHEMA = T.StructType([
    _f("release_id", T.IntegerType(), False),
    _f("duration", T.IntegerType()),
    _f("src", T.StringType()),
    _f("title", T.StringType()),
])

ARTIST_SCHEMA = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("name", T.StringType()),
    _f("real_name", T.StringType()),
    _f("profile", T.StringType()),
    _f("data_quality", T.StringType()),
    _f("name_variations", _STR_ARR),
    _f("urls", _STR_ARR),
    _f("aliases", _STR_ARR),
    _f("members", _STR_ARR),
])

LABEL_SCHEMA = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("name", T.StringType()),
    _f("contactinfo", T.StringType()),
    _f("profile", T.StringType()),
    _f("parent_label", T.StringType()),
    _f("sublabels", _STR_ARR),
    _f("urls", _STR_ARR),
    _f("data_quality", T.StringType()),
])

MASTER_SCHEMA = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("title", T.StringType()),
    _f("release_id", T.IntegerType()),
    _f("year", T.IntegerType()),
    _f("notes", T.StringType()),
    _f("genres", _STR_ARR),
    _f("styles", _STR_ARR),
    _f("data_quality", T.StringType()),
])

MASTER_ARTIST_SCHEMA = T.StructType([
    _f("artist_id", T.IntegerType(), False),
    _f("master_id", T.IntegerType(), False),
    _f("name", T.StringType()),
    _f("anv", T.StringType()),
    _f("role", T.StringType()),
])

OUTPUT_SCHEMAS: dict[str, T.StructType] = {
    "release": RELEASE_SCHEMA,
    "release_label": RELEASE_LABEL_SCHEMA,
    "release_video": RELEASE_VIDEO_SCHEMA,
    "artist": ARTIST_SCHEMA,
    "label": LABEL_SCHEMA,
    "master": MASTER_SCHEMA,
    "master_artist": MASTER_ARTIST_SCHEMA,
}

# ---------------------------------------------------------------------------
# XML input record schemas (for spark.read.format('xml')).
# Attribute fields use the native XML source's '_' prefix.
# ---------------------------------------------------------------------------

RELEASE_XML_SCHEMA = T.StructType([
    _f("_id", T.IntegerType()),
    _f("_status", T.StringType()),
    _f("title", T.StringType()),
    _f("country", T.StringType()),
    _f("released", T.StringType()),
    _f("notes", T.StringType()),
    _f("master_id", T.IntegerType()),
    _f("data_quality", T.StringType()),
    _f("genres", T.StructType([_f("genre", _STR_ARR)])),
    _f("styles", T.StructType([_f("style", _STR_ARR)])),
    _f(
        "labels",
        T.StructType([
            _f(
                "label",
                T.ArrayType(
                    T.StructType([
                        _f("_name", T.StringType()),
                        _f("_catno", T.StringType()),
                        _f("_id", T.IntegerType()),
                    ])
                ),
            )
        ]),
    ),
    _f(
        "videos",
        T.StructType([
            _f(
                "video",
                T.ArrayType(
                    T.StructType([
                        _f("_src", T.StringType()),
                        _f("_duration", T.IntegerType()),
                        _f("title", T.StringType()),
                    ])
                ),
            )
        ]),
    ),
])

ARTIST_XML_SCHEMA = T.StructType([
    _f("id", T.IntegerType()),
    _f("name", T.StringType()),
    _f("realname", T.StringType()),
    _f("profile", T.StringType()),
    _f("data_quality", T.StringType()),
    _f("namevariations", T.StructType([_f("name", _STR_ARR)])),
    _f("urls", T.StructType([_f("url", _STR_ARR)])),
    _f("aliases", T.StructType([_f("name", _STR_ARR)])),
    _f("members", T.StructType([_f("name", _STR_ARR)])),
])

LABEL_XML_SCHEMA = T.StructType([
    _f("id", T.IntegerType()),
    _f("name", T.StringType()),
    _f("contactinfo", T.StringType()),
    _f("profile", T.StringType()),
    _f("parent_label", T.StringType()),
    _f("data_quality", T.StringType()),
    _f("sublabels", T.StructType([_f("label", _STR_ARR)])),
    _f("urls", T.StructType([_f("url", _STR_ARR)])),
])

MASTER_XML_SCHEMA = T.StructType([
    _f("_id", T.IntegerType()),
    _f("main_release", T.IntegerType()),
    _f("title", T.StringType()),
    _f("year", T.IntegerType()),
    _f("notes", T.StringType()),
    _f("data_quality", T.StringType()),
    _f("genres", T.StructType([_f("genre", _STR_ARR)])),
    _f("styles", T.StructType([_f("style", _STR_ARR)])),
    _f(
        "artists",
        T.StructType([
            _f(
                "artist",
                T.ArrayType(
                    T.StructType([
                        _f("id", T.IntegerType()),
                        _f("name", T.StringType()),
                        _f("anv", T.StringType()),
                        _f("role", T.StringType()),
                    ])
                ),
            )
        ]),
    ),
])

XML_SCHEMAS: dict[str, T.StructType] = {
    "releases": RELEASE_XML_SCHEMA,
    "artists": ARTIST_XML_SCHEMA,
    "labels": LABEL_XML_SCHEMA,
    "masters": MASTER_XML_SCHEMA,
}

ROW_TAGS: dict[str, str] = {
    "releases": "release",
    "artists": "artist",
    "labels": "label",
    "masters": "master",
}
