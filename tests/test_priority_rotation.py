"""Rotation-policy guard: the driver's correctness gate checks roughly the
first 50 registry entries per round, so slots spent re-proving
already-green queries are slots an unverified query doesn't get (r03 spent
3 re-proving q32/q89/q95 while 34 queries had no driver row at all).

Derived from the COMMITTED CORRECTNESS_r*.json artifacts, not a
hand-maintained list: a query is *settled* once any round gave it a fully
green row (rows/schema/hash all true) or its by-design rows-only row
(``err: 'no_oracle'`` — the driver's weaker check for oracle-less
queries, which is all they can ever earn). Everything else is *unsettled*
and must outrank every settled query inside the gate window.
"""

from __future__ import annotations

import json
from pathlib import Path

from discogs_load_spark.queries import REGISTRY
from discogs_load_spark.queries.registry import PRIORITY

REPO = Path(__file__).resolve().parent.parent
GATE_BUDGET = 50


def _settled_queries() -> set[str]:
    settled: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            if row.get("err") == "no_oracle":
                settled.add(name)  # rows-only by design: best possible row
            elif row.get("err") is None and all(
                row.get(k) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                settled.add(name)
    return settled


def test_unsettled_queries_outrank_settled_in_gate_window():
    settled = _settled_queries()
    assert settled, "no CORRECTNESS_r*.json artifacts found"
    window = [n for n in PRIORITY if n in REGISTRY][:GATE_BUDGET]
    # All-settled state: nothing to outrank, the window is free for
    # regression re-proof rotation (max default=0 keeps the slice empty).
    last_unsettled = max(
        (i for i, n in enumerate(window) if n not in settled), default=0
    )
    misplaced = [n for n in window[:last_unsettled] if n in settled]
    assert not misplaced, (
        "green queries outrank unverified ones in the gate window "
        f"(re-burning driver slots): {misplaced}"
    )


def test_every_unsettled_query_gets_a_gate_slot():
    settled = _settled_queries()
    unsettled = [n for n in REGISTRY if n not in settled]
    window = set(PRIORITY[:GATE_BUDGET])
    if len(unsettled) <= GATE_BUDGET:
        left_out = [n for n in unsettled if n not in window]
        assert not left_out, (
            f"unverified queries missing from the gate window: {left_out}"
        )
    else:
        # more debt than budget: at least insist the whole window is debt
        settled_in_window = [n for n in PRIORITY[:GATE_BUDGET] if n in settled]
        assert not settled_in_window


def test_gate_window_does_not_replay_previous_round():
    """r05 failure mode (VERDICT r05 item 1): the window shipped unchanged,
    so the driver re-verified the previous round's exact 50 queries and the
    round's changed oracles got no row. Encode the rotation policy: at most
    5 window entries may have been checked in the NEWEST committed
    CORRECTNESS artifact (slack for deliberately re-proving changed
    oracles); everything else must rotate to queries the last round did
    not check."""
    artifacts = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert artifacts
    newest = set(json.loads(artifacts[-1].read_text()))
    window = [n for n in PRIORITY if n in REGISTRY][:GATE_BUDGET]
    replayed = [n for n in window if n in newest]
    assert len(replayed) <= 5, (
        f"{len(replayed)} of {GATE_BUDGET} gate slots replay queries already "
        f"checked in {artifacts[-1].name} — rebuild PRIORITY: {replayed[:10]}"
    )


def test_gate_window_leads_with_changed_or_new_oracles():
    """The r08 rebuild (VERDICT r07 item 1) switches to staleness
    rotation: all 185 pre-r08 queries are settled, so the head is (a)
    this round's brand-new queries — no driver row yet — then (b) the
    queries whose newest green driver row is oldest (the r01-only block;
    q28 excluded: its best row is rows-only `no_oracle` by design).
    Update this list when a future round changes other oracles."""
    new_r08 = [
        "q191_best_fuzzy_match",
        "q192_best_embedding_match",
        "q193_copy_codec_roundtrip",
        "q194_salted_join_autotune",
        "q195_minhash_best_match",
        "q196_sorted_neighborhood",
        "q197_sparse_best_match",
        "q198_linkage_score",
        "q199_adaptive_lsh_best_match",
        "q200_merge_purge_pipeline",
    ]
    r01_stale = [
        "q51_minhash_lsh_pairs",
        "q52_jaccard_neardup",
        "q53_simhash",
        "q64_simhash_hamming_pairs",
        "q40_tumbling_window",
        "q41_sessionization",
        "q42_asof_join",
        "q46_sliding_window",
        "q25_percentiles_variance",
        "q26_pivot",
        "q27_correlated_subquery",
        "q35_merge_upsert",
        "q44_time_range_join",
        "q29_grouping_sets",
        "q36_window_suite",
        "q45_bucketized_range_join",
        "q47_scd2_history",
    ]
    expected = [n for n in new_r08 + r01_stale if n in REGISTRY]
    window = [n for n in PRIORITY if n in REGISTRY][: len(expected)]
    assert window == expected
    # every implemented r08 query must sit in the gate window
    implemented_new = [n for n in new_r08 if n in REGISTRY]
    assert window[: len(implemented_new)] == implemented_new


def test_every_oracle_is_single_statement():
    """The driver wraps each oracle in its own execute; a stray semicolon
    (even inside a SQL comment) could split or abort that wrapper."""
    bad = [n for n, s in REGISTRY.items() if s.oracle and ";" in s.oracle]
    assert not bad, f"oracles containing ';': {bad}"
