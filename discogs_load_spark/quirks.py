"""Reference behaviors the engine deliberately does NOT replicate.

The oracle-checked semantics of this engine are the *clean* ones; each quirk
below is a latent bug in the reference (evidence cited), kept here so parity
reviews can tell deviation-by-design from omission. SURVEY.md §1.3/§4.2 has
the full analysis.

Q1  Master fields never parsed. The reference's master parser has no states
    for year/notes/genres/styles (master.rs:81-94, dispatch 148-154); the
    columns exist but are always 0/''/{}. Engine: parses them
    (operators/shred.py::shred_masters).

Q2  release_video.title hard-set to ''. release.rs:362 writes "" instead of
    the <title> child. Engine: reads the title, defaults '' when absent.

Q3  release_label links dropped within a batch. The per-batch HashMap is
    keyed by label_id (release.rs:330), so only the FIRST release touching a
    label inside a 10k batch keeps its link — data loss dependent on batch
    boundaries. Engine: keeps every link (explode, no dedup).

Q4  Artist aliases appended to members (artist.rs:233-242) and
    name_variations never populated (the NameVariations state falls through
    to Members, artist.rs:263). Engine: each array from its own element.

Q5  Positional attribute access. id/status, name/catno/id, src/duration are
    read as attributes #0/#1/#2 (release.rs:157-163,326-341,350-363) —
    attribute-order-dependent. Engine: reads attributes by name.

Q6  Sticky fields. Per-record structs are only partially reset between
    records (release.rs:157-167 resets 4 of 10 fields), so an absent element
    inherits the previous record's value. Engine: every record is
    independent; absent → default.

Q7  Batch-scoped first-wins dedup. Dedup scope is one 10k batch
    (release.rs:184-203): duplicate ids in different batches BOTH load, and
    the later PK creation (sql/indexes.sql:2) would fail. Engine: global
    first-wins keyed by explicit ingest order
    (operators/relational.py::first_wins_dedup), applied at the RECORD
    grain before any table is derived — so a losing duplicate's child
    rows (labels/videos/artist links) are dropped with their parent
    rather than leaking into the child tables (q137 reproduces the
    faithful batch-scoped semantics under the oracle).

Q8  Whitespace-sensitive array parsing. With pretty-printed XML the
    urls/aliases/members sub-states bounce back on whitespace text events and
    produce empty arrays (artist.rs:211-249 + quick-xml trim_text default).
    Engine: structural parsing, whitespace-immune.

Q9  Tar-in-gzip test dumps silently tolerated. The reference's own
    test_data/artists.xml.gz and masters.xml.gz are `tar czf` outputs, not
    plain gzip; the reference parses them only because quick-xml scans past
    the 512-byte tar header (NUL-padded filename block) to the first '<'
    (main.rs:96-102 never validates the decompressed payload). Engine:
    sources/xml_source._open_maybe_gzip detects the ustar magic and extracts
    the member explicitly — same observable behavior, no reliance on a
    parser's garbage tolerance (tests/test_shred_xml.py parity suite covers
    all four reference dumps raw + gz).
"""
