"""Shred operators: nested Discogs records → the 7 flat output tables.

The Spark duals of the reference's hand-written FSM extractors
(release.rs:153-371, artist.rs:102-267, label.rs:97-249, master.rs:135-285):
parent rows are projection + cast + default-fill; child tables are
``explode``; duplicate ids resolve first-wins (A11) with an explicit order.

Default-fill semantics (reference structs init to 0/''/[] —
release.rs:74-88): absent scalar → ''/0, absent array → []. This is the
engine's declared behavior; quirks the engine deliberately does NOT
replicate are listed in quirks.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .relational import first_wins_dedup


def _s(col: str) -> Column:  # default-fill string
    return F.coalesce(F.col(col), F.lit(""))


def _i(col: str) -> Column:  # default-fill int
    return F.coalesce(F.col(col).cast("int"), F.lit(0))


def _arr(col: str) -> Column:  # default-fill array<string>
    return F.coalesce(F.col(col), F.array().cast("array<string>"))


def _order_col(df: DataFrame) -> DataFrame:
    """Stable per-row ingest order for first-wins dedup: file order within a
    partition, partition id across files — the deterministic analogue of the
    reference's arrival order."""
    return df.withColumn("__ord", F.monotonically_increasing_id())


def shred_releases(raw: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
    """releases dump → release, release_label, release_video.

    Parity notes (reference release.rs):
    - attribute access by NAME, not position (deviation from
      release.rs:157-163 positional reads — quirks.py Q5);
    - release_video.title comes from the XML (reference hard-sets ''
      — release.rs:362, quirks.py Q2); fill '' only when absent;
    - every label link is kept (reference's per-batch HashMap keyed by
      label_id drops repeats — release.rs:330, quirks.py Q3).

    Duplicate-id records dedup at the RECORD grain before any table is
    derived, so child tables carry only the WINNING occurrence's children
    — a losing duplicate's labels/videos must not leak into the child
    tables its parent was dropped from (they'd dangle or double).
    The deduped frame is persisted by default: all three outputs derive
    from it, and without the persist each materialization re-runs the
    dedup window. ``persist=False`` opts out for a caller consuming ONE
    output table once — the cache would pin the FULL record schema and
    block the XML scan's column pruning (the window itself prunes fine:
    Catalyst keeps only the dedup keys + consumed fields).
    """
    from pyspark.storagelevel import StorageLevel

    raw = first_wins_dedup(
        _order_col(raw).filter(F.col("_id").isNotNull()),
        ["_id"],
        [F.col("__ord")],
    ).drop("__ord")
    if persist:
        raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    release = raw.select(
        F.col("_id").cast("int").alias("id"),
        _s("_status").alias("status"),
        _s("title").alias("title"),
        _s("country").alias("country"),
        _s("released").alias("released"),
        _s("notes").alias("notes"),
        _arr("genres.genre").alias("genres"),
        _arr("styles.style").alias("styles"),
        _i("master_id").alias("master_id"),
        _s("data_quality").alias("data_quality"),
    )

    labels_exploded = raw.select(
        F.col("_id").cast("int").alias("release_id"),
        F.explode("labels.label").alias("l"),
    )
    release_label = labels_exploded.select(
        "release_id",
        F.coalesce(F.col("l._name"), F.lit("")).alias("label"),
        F.coalesce(F.col("l._catno"), F.lit("")).alias("catno"),
        F.coalesce(F.col("l._id").cast("int"), F.lit(0)).alias("label_id"),
    )

    videos_exploded = raw.select(
        F.col("_id").cast("int").alias("release_id"),
        F.explode("videos.video").alias("v"),
    )
    release_video = videos_exploded.select(
        "release_id",
        F.coalesce(F.col("v._duration").cast("int"), F.lit(0)).alias("duration"),
        F.coalesce(F.col("v._src"), F.lit("")).alias("src"),
        F.coalesce(F.col("v.title"), F.lit("")).alias("title"),
    )
    return {
        "release": release,
        "release_label": release_label,
        "release_video": release_video,
    }


def shred_artists(raw: DataFrame) -> dict[str, DataFrame]:
    """artists dump → artist. name_variations IS populated and aliases stay
    out of members (reference bugs artist.rs:233-263 — quirks.py Q4)."""
    raw = _order_col(raw)
    artist = first_wins_dedup(
        raw.select(
            F.col("id").cast("int").alias("id"),
            _s("name").alias("name"),
            _s("realname").alias("real_name"),
            _s("profile").alias("profile"),
            _s("data_quality").alias("data_quality"),
            _arr("namevariations.name").alias("name_variations"),
            _arr("urls.url").alias("urls"),
            _arr("aliases.name").alias("aliases"),
            _arr("members.name").alias("members"),
            F.col("__ord"),
        ).filter(F.col("id").isNotNull()),
        ["id"],
        [F.col("__ord")],
    ).drop("__ord")
    return {"artist": artist}


def shred_labels(raw: DataFrame) -> dict[str, DataFrame]:
    """labels dump → label (label.rs:97-249)."""
    raw = _order_col(raw)
    label = first_wins_dedup(
        raw.select(
            F.col("id").cast("int").alias("id"),
            _s("name").alias("name"),
            _s("contactinfo").alias("contactinfo"),
            _s("profile").alias("profile"),
            _s("parent_label").alias("parent_label"),
            _arr("sublabels.label").alias("sublabels"),
            _arr("urls.url").alias("urls"),
            _s("data_quality").alias("data_quality"),
            F.col("__ord"),
        ).filter(F.col("id").isNotNull()),
        ["id"],
        [F.col("__ord")],
    ).drop("__ord")
    return {"label": label}


def shred_masters(raw: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
    """masters dump → master, master_artist.

    year/notes/genres/styles ARE parsed (the reference never fills them —
    master.rs:81-94, quirks.py Q1). Record-grain first-wins dedup before
    deriving either table, so master_artist carries only the winning
    occurrence's artist links (see shred_releases)."""
    from pyspark.storagelevel import StorageLevel

    raw = first_wins_dedup(
        _order_col(raw).filter(F.col("_id").isNotNull()),
        ["_id"],
        [F.col("__ord")],
    ).drop("__ord")
    if persist:
        raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    master = raw.select(
        F.col("_id").cast("int").alias("id"),
        _s("title").alias("title"),
        _i("main_release").alias("release_id"),
        _i("year").alias("year"),
        _s("notes").alias("notes"),
        _arr("genres.genre").alias("genres"),
        _arr("styles.style").alias("styles"),
        _s("data_quality").alias("data_quality"),
    )

    master_artist = (
        raw.select(
            F.col("_id").cast("int").alias("master_id"),
            F.explode("artists.artist").alias("a"),
        )
        .select(
            F.coalesce(F.col("a.id").cast("int"), F.lit(0)).alias("artist_id"),
            "master_id",
            F.coalesce(F.col("a.name"), F.lit("")).alias("name"),
            F.coalesce(F.col("a.anv"), F.lit("")).alias("anv"),
            F.coalesce(F.col("a.role"), F.lit("")).alias("role"),
        )
    )
    return {"master": master, "master_artist": master_artist}


SHREDDERS = {
    "releases": shred_releases,
    "artists": shred_artists,
    "labels": shred_labels,
    "masters": shred_masters,
}


def shred(
    raw: DataFrame, kind: str, persist: bool = True
) -> dict[str, DataFrame]:
    """Dispatch: nested dump DataFrame → {table_name: DataFrame}."""
    fn = SHREDDERS[kind]
    if fn in (shred_releases, shred_masters):
        return fn(raw, persist=persist)
    return fn(raw)
