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
    """The r06 rebuild puts the round's never-driver-checked deliverables
    first: q170 (new), q171/q172 (new, BPE train/apply), q173 (new, RRF),
    q174 (new, schema evolution), q175 (new, OPH MinHash), q176/q177
    (new, GD classifier + AUC eval), q178 (new, Kneser-Ney), q179 (new,
    KMV sketch), q71 (oracle rewritten r05), q72 (oracle fixed r06);
    r07 appends its eleven new queries (q180 count-min, q181 perceptual
    image dedup, q182 PMI collocations, q183 weighted sampling, q184
    Bloom membership, q185 Hamilton allocation, q186 skew profile,
    q187 grouped OLS, q188 half-life decay, q189 quantile-cut bins,
    q190 streaming count-min) after q179 so the whole
    never-driver-checked block stays contiguous.
    Update this list when a future round changes other oracles."""
    window = [n for n in PRIORITY if n in REGISTRY][:23]
    assert window == [
        "q170_preshard_ingest",
        "q171_bpe_merges",
        "q172_bpe_encode",
        "q173_hybrid_rrf",
        "q174_schema_evolution",
        "q175_oph_minhash_pairs",
        "q176_quality_classifier",
        "q177_feature_auc",
        "q178_kneser_ney",
        "q179_kmv_sketch",
        "q180_countmin_heavy_hitters",
        "q181_image_phash_dedup",
        "q182_pmi_collocations",
        "q183_weighted_priority_sample",
        "q184_bloom_membership",
        "q185_stratified_allocation",
        "q186_join_key_skew_profile",
        "q187_grouped_ols",
        "q188_halflife_decay",
        "q189_quantile_cut_bins",
        "q190_streaming_countmin",
        "q71_multimodal_features",
        "q72_frame_sampling",
    ]


def test_every_oracle_is_single_statement():
    """The driver wraps each oracle in its own execute; a stray semicolon
    (even inside a SQL comment) could split or abort that wrapper."""
    bad = [n for n, s in REGISTRY.items() if s.oracle and ";" in s.oracle]
    assert not bad, f"oracles containing ';': {bad}"
