"""Dual-dialect text expression builders (Spark SQL + DuckDB).

Dedup/fingerprint operators must produce IDENTICAL values in the engine and
in the DuckDB oracle, so every hash-bearing expression is generated here for
both dialects from one definition. Two deliberate representation choices make
that possible without any custom UDF:

- **MinHash over md5 hex strings.** A MinHash needs a family of independent
  hash→total-order functions; ``min`` over the lexicographic order of
  ``md5(seed || ':' || shingle)`` hex digests is exactly that (md5 is
  uniform; the hex alphabet gives a total order), and both engines produce
  byte-identical lowercase hex. No 64-bit integer conversions — DuckDB and
  Spark disagree on hex→int builtins, but never on strings.
- **SimHash bits from md5 nibbles.** Bit j of a shingle's 32-bit SimHash
  contribution is bit (3 - j%4) of hex nibble j/4 — extracted with
  substring + instr('0123456789abcdef', …), which both engines share.

Normalization is ASCII-level (lower + non-alphanumeric → space + collapse):
identical under Java regex and RE2.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Normalization / tokens / shingles
# ---------------------------------------------------------------------------


def norm_sql(col: str, dialect: str) -> str:
    """Lowercase, strip non-alphanumerics, collapse whitespace."""
    g = ", 'g'" if dialect == "duckdb" else ""
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), "
        f"'[^a-z0-9 ]', ' '{g}), ' +', ' '{g}))"
    )


def tokens_sql(norm: str, dialect: str) -> str:
    if dialect == "duckdb":
        return f"(CASE WHEN {norm} = '' THEN [] ELSE string_split({norm}, ' ') END)"
    return (
        f"(CASE WHEN {norm} = '' THEN array() ELSE split({norm}, ' ') END)"
    )


def shingles_sql(toks: str, k: int, dialect: str) -> str:
    """Word k-grams joined by single spaces; [] when fewer than k tokens.

    DuckDB: generate_series + list_transform, with the token list bound
    ONCE per row via an outer single-element ``list_transform([toks], t ->
    …)[1]``. DuckDB re-evaluates any expression referenced inside a lambda
    body PER ELEMENT (measured 2.65 s vs 0.05 s over 500 ~300-char docs —
    O(tokens²) when ``toks`` is the full norm→split chain); a lambda
    *variable* is bound once, so the inner lambda indexes ``t``, never the
    ``toks`` expression. The < k guard lives inside the outer lambda
    (generate_series needs it for the negative-range case).

    Spark: zip_with over k shifted slices. The naive
    ``transform(sequence(...), i -> slice(toks, i, k))`` form re-evaluates
    the whole ``toks`` expression PER ELEMENT (Catalyst inlines the
    expression into the lambda body) — O(tokens²) per document, measured
    10× slower at 5k docs. zip_with lambda bodies touch only lambda
    variables, so ``toks`` is evaluated O(k) times per row. Also dodges
    Spark's sequence(1, 0) == [1, 0] descending surprise.
    """
    if dialect == "duckdb":
        gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
        return (
            f"list_transform([{toks}], t -> "
            f"CASE WHEN len(t) < {k} THEN [] ELSE "
            f"list_transform(generate_series(1, len(t) - {k - 1}), "
            f"i -> {gram}) END)[1]"
        )
    m = f"greatest(size({toks}) - {k - 1}, 0)"
    expr = f"slice({toks}, 1, {m})"
    for j in range(1, k):
        expr = (
            f"zip_with({expr}, slice({toks}, {j + 1}, {m}), "
            f"(x, y) -> concat(x, ' ', y))"
        )
    return expr


def doc_shingles_sql(text_col: str, k: int, dialect: str) -> str:
    """text column → shingle array, composed end to end."""
    return shingles_sql(
        tokens_sql(norm_sql(text_col, dialect), dialect), k, dialect
    )


# ---------------------------------------------------------------------------
# MinHash / LSH bands
# ---------------------------------------------------------------------------


def minhash_agg_sql(shingle_col: str, n_hashes: int) -> list[str]:
    """n independent min-hashes over an exploded shingle column; identical
    text in both dialects. h{i} = min(md5('{i}:' || shingle))."""
    return [
        f"min(md5('{i}:' || {shingle_col})) AS h{i}" for i in range(n_hashes)
    ]


def oph_bucket_sql(md5_expr: str, n_buckets: int) -> str:
    """One-permutation-hashing bucket index from an md5 hex string: the
    first two nibbles as an int 0..255, mod the bucket count. Pure
    instr/substring text, identical in both dialects (the SimHash nibble
    recipe), so bucket assignment agrees byte-for-byte cross-engine.

    One byte of entropy caps the scheme at 256 buckets — past that,
    buckets >= 256 could never receive a hash and densification would
    silently copy lower slots into them, wrecking the estimator while
    every slot still looks populated."""
    if n_buckets > 256:
        raise ValueError(
            f"oph_bucket_sql routes on one md5 byte: n_buckets={n_buckets} > 256 "
            "would leave permanently-empty buckets (widen the nibble count first)"
        )
    n1 = f"(instr('0123456789abcdef', substring({md5_expr}, 1, 1)) - 1)"
    n2 = f"(instr('0123456789abcdef', substring({md5_expr}, 2, 1)) - 1)"
    return f"((({n1} * 16) + {n2}) % {n_buckets})"


def band_key_sql(band: int, rows_per_band: int, dialect: str) -> str:
    """LSH band key: md5 of the band's concatenated minhashes.

    The Spark side separates with '|' so VARIABLE-LENGTH minhash values
    (the hashed index's bigint signatures print as 1-19 decimal digits)
    can't alias across slots (concat(1, 11) == concat(11, 1) otherwise).
    The oracle side keeps plain `||` concatenation: its fixed-width
    32-hex minhashes are injective without a separator, and the
    separator makes the two dialects' key VALUES differ (before the
    '|' change they coincided in string mode — md5 over the same
    concatenation). That divergence is safe because keys never appear
    in query outputs; only bucket MEMBERSHIP matters, and both forms
    are injective over non-null slots within their own dialect.

    NULL slots null the whole key (ADVICE r11): concat_ws SKIPS nulls,
    so without the guard a partially-null signature row would hash to a
    valid band key that aliases with the same row minus the null slot —
    and lsh_candidate_pairs / adaptive_lsh_candidate_pairs are public
    operators taking arbitrary signature frames, so safety must not
    rest on the accessors' pre-filtering alone. A nulled key drops the
    row out of the band equi-join, exactly what plain concat did before
    the separator change. The DuckDB `||` chain null-propagates
    natively."""
    lo = band * rows_per_band
    cols = [f"h{i}" for i in range(lo, lo + rows_per_band)]
    if dialect == "duckdb":
        return f"md5({' || '.join(cols)})"
    any_null = " OR ".join(f"{c} IS NULL" for c in cols)
    return (
        f"(CASE WHEN {any_null} THEN CAST(NULL AS STRING)"
        f" ELSE md5(concat_ws('|', {', '.join(cols)})) END)"
    )


# Adaptive-parameter ladders (the q199/q194 discipline generalized —
# VERDICT r08 item 7): a compile-time constant that a 100 TB corpus would
# want derived from corpus statistics becomes an integer CASE ladder over
# the corpus row count, read once as a broadcast scalar, inside ONE static
# dual-dialect plan. Pure integer comparisons — log2 is transcendental and
# banned by the cross-engine hash gate.

ADAPTIVE_BAND_RUNGS = (3, 6, 12)  # rows-per-band; each divides the next


def adaptive_band_rows_sql(n_col: str) -> str:
    """LSH rows-per-band r as a ladder over corpus size: a random pair
    collides in one band with probability ~E[J]^r, so the expected
    random-candidate volume is ~N²·b·E[J]^r — widening the band (raising
    r) with log N is the banding counterpart of q199's plane-prefix
    ladder. Each rung divides the next (3 | 6 | 12), so every wider band
    is a CONCATENATION of narrower bands and the candidate sets strictly
    NEST: agreeing on hashes [0..5] implies agreeing on [0..2] and
    [3..5], so candidates(r=6) ⊆ candidates(r=3) on any input — the same
    only-coarsen/only-refine family property the plane-prefix ladder has
    (asserted in tests). Rung thresholds are cost-model constants like
    ADAPTIVE_LSH_TARGET: the corpus size where the narrower geometry's
    random-candidate volume stops being linear on the measured fixture
    family."""
    return (
        f"(CASE WHEN {n_col} <= 4096 THEN 3"
        f" WHEN {n_col} <= 65536 THEN 6 ELSE 12 END)"
    )


def adaptive_snb_window_sql(n_col: str, d_col: str, dialect: str) -> str:
    """Sorted-neighborhood window w as a ladder over the blocking key's
    mean multiplicity m = ceil(n_rows / n_distinct_keys): two records of
    the same entity sorted by a key with m exact-collision copies can sit
    up to ~m interleaved rows apart, so a FIXED w silently loses recall
    exactly as the catalog grows denser (w=3 at m=10 misses most
    same-name duplicates — measured on the 10x tiled tier, where every
    name repeats once per tile). Output stays w·N — linear by
    construction at every rung. Integer ceiling division only; the one
    dialect split is the integer-div operator."""
    div = f"(({n_col} + {d_col} - 1) // {d_col})"
    if dialect == "spark":
        div = f"(({n_col} + {d_col} - 1) div {d_col})"
    return (
        f"(CASE WHEN {div} <= 2 THEN 3"
        f" WHEN {div} <= 16 THEN 16"
        f" WHEN {div} <= 64 THEN 64 ELSE 256 END)"
    )


def adaptive_cms_width_sql(n_col: str) -> str:
    """Count-min width as a ladder over the corpus TOKEN count: the CMS
    per-cell error bound is ~N_tokens/width, so a frozen width means the
    sketch's absolute error grows linearly with the corpus while its
    memory stays flat — the wrong trade at 100 TB. Rung edges hold the
    expected per-cell collision mass at <= 1024 tokens (65536/64 =
    262144/256 = 2²⁰/1024 = 1024) while the grid stays broadcast-small
    (depth x 4096 cells max)."""
    return (
        f"(CASE WHEN {n_col} <= 65536 THEN 64"
        f" WHEN {n_col} <= 262144 THEN 256"
        f" WHEN {n_col} <= 1048576 THEN 1024 ELSE 4096 END)"
    )


def adaptive_df_cap_sql(n_col: str) -> str:
    """Document-frequency cap for posting-list self-joins as a ladder over
    corpus size: cap = sqrt(N) at each band's upper edge (64² = 4096,
    256² = 65536, 1024² = 2²⁰), so the worst per-term candidate volume
    df² stays <= N and the total over a fixed vocabulary stays linear in
    N — while the ABSOLUTE cap still grows, admitting more mid-frequency
    terms as the corpus grows (a frozen cap silently discards an
    ever-larger share of the vocabulary instead)."""
    return (
        f"(CASE WHEN {n_col} <= 4096 THEN 64"
        f" WHEN {n_col} <= 65536 THEN 256"
        f" WHEN {n_col} <= 1048576 THEN 1024 ELSE 4096 END)"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_bit_sql(shingle_md5: str, j: int, dialect: str) -> str:
    """±1 contribution of one shingle to SimHash bit j."""
    nibble = f"(instr('0123456789abcdef', substring({shingle_md5}, {1 + j // 4}, 1)) - 1)"
    shift = 3 - j % 4
    if dialect == "duckdb":
        bit = f"(({nibble} >> {shift}) % 2)"
    else:
        bit = f"((shiftright({nibble}, {shift})) % 2)"
    return f"(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END)"


def simhash_value_sql(sum_prefix: str = "s") -> str:
    """Final SimHash from the 32 per-bit signed sums (columns s0..s31):
    bit j set iff the majority of shingles set it (ties → set)."""
    terms = [
        f"(CASE WHEN {sum_prefix}{j} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Token/quality statistics (shared scalar fragments)
# ---------------------------------------------------------------------------

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "y", "de"],
}


def stopword_hits_sql(toks: str, words: list[str], dialect: str) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "duckdb":
        return f"len(list_filter({toks}, t -> t IN ({lst})))"
    return f"size(filter({toks}, t -> t IN ({lst})))"


def stopword_ratio_sql(toks: str, words: list[str], dialect: str) -> str:
    """Stopword hits / token count (>=1 guard), as DOUBLE — the shared
    feature/score fragment for the classifier-training (q176) and
    AUC-evaluation (q177) pair, which must stay bitwise identical."""
    length = "len" if dialect == "duckdb" else "size"
    return (
        f"(CAST({stopword_hits_sql(toks, words, dialect)} AS DOUBLE)"
        f" / GREATEST({length}({toks}), 1))"
    )


def token_count_sql(text_col: str, dialect: str) -> str:
    """BPE-ish token count: alpha runs, digit runs, single punctuation.

    The pattern avoids backslash classes (Spark SQL string literals treat
    backslash as an escape; DuckDB's don't) and wraps in a group because
    Spark's regexp_extract_all demands a group index.
    """
    pat = "'([a-z]+|[0-9]+|[^a-z0-9 ])'"
    if dialect == "duckdb":
        return f"len(regexp_extract_all(lower({text_col}), {pat}))"
    return f"size(regexp_extract_all(lower({text_col}), {pat}, 1))"


def char_class_count_sql(text_col: str, char_class: str, dialect: str) -> str:
    """#chars matching a regex class, via length difference after removal."""
    g = ", 'g'" if dialect == "duckdb" else ""
    return (
        f"(length({text_col}) - "
        f"length(regexp_replace({text_col}, '{char_class}', ''{g})))"
    )


# ---------------------------------------------------------------------------
# Rolling hash (Rabin-Karp) fingerprint
# ---------------------------------------------------------------------------

RH_BASE = 256
RH_MOD = 1_000_000_007
RH_K = 8


def rolling_hash_min_sql(s: str, dialect: str, k: int = RH_K) -> str:
    """Minimum Rabin-Karp hash over all k-char windows of ``s`` (NULL when
    shorter than k) — a winnowing-style content fingerprint robust to
    edits outside the minimal window.

    h(window) = Σ code(cⱼ)·B^(k-1-j) mod M, with the power table
    precomputed in Python (pow(B, ·, M)) and inlined — both engines'
    float pow() loses integer precision past 2^53.

    Spark evaluates the true O(n) ROLLING recurrence — one `aggregate`
    fold carrying (current hash, min-so-far):
    h' = (h − code(out)·B^(k-1))·B + code(in) mod M, kept non-negative so
    both engines' truncated ``%`` agree. DuckDB runs the O(n·k) windowed
    definition; identical values by construction.
    """
    B, M, K = RH_BASE, RH_MOD, k
    P = [pow(B, K - 1 - j, M) for j in range(K)]
    if dialect == "duckdb":
        terms = " + ".join(
            f"(ascii(substr({s}, CAST(i + {j} AS INT), 1)) * CAST({P[j]} AS BIGINT)) % {M}"
            for j in range(K)
        )
        return (
            f"(CASE WHEN length({s}) < {K} THEN NULL ELSE "
            f"list_min(list_transform(generate_series(1, length({s}) - {K - 1}), "
            f"i -> ({terms}) % {M})) END)"
        )
    first = (
        "("
        + " + ".join(
            f"(ascii(substring({s}, {j + 1}, 1)) * {P[j]}L) % {M}" for j in range(K)
        )
        + f") % {M}"
    )
    nh = (
        f"((acc.h + {M} - (ascii(substring({s}, i - {K}, 1)) * {P[0]}L) % {M})"
        f" * {B} + ascii(substring({s}, i, 1))) % {M}"
    )
    return (
        f"(CASE WHEN length({s}) < {K} THEN NULL ELSE "
        f"aggregate("
        f"IF(length({s}) >= {K + 1}, sequence({K + 1}, length({s})), array()), "
        f"named_struct('h', CAST({first} AS BIGINT), 'mn', CAST({first} AS BIGINT)), "
        f"(acc, i) -> named_struct('h', {nh}, 'mn', least(acc.mn, {nh})), "
        f"acc -> acc.mn) END)"
    )


def hex_prefix_num_sql(hex_expr: str, n_chars: int = 8) -> str:
    """First ``n_chars`` hex chars of an md5 string as a BIGINT in
    [0, 16^n): a nibble-weighted instr sum, identical text in both
    dialects (the SimHash recipe). 8 chars = 32 bits of uniform hash —
    the KMV estimator's numeric domain."""
    terms = " + ".join(
        # widen the nibble BEFORE the weight multiply: 15 * 16^7 overflows
        # INT32 and ANSI Spark raises instead of wrapping
        f"CAST(instr('0123456789abcdef', substring({hex_expr}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (n_chars - 1 - i)}"
        for i in range(n_chars)
    )
    return f"CAST({terms} AS BIGINT)"
