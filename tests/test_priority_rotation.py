"""Rotation-policy guard: the driver's correctness gate checks roughly the
first 50 registry entries per round, so slots spent re-proving
already-green queries are slots an unverified query doesn't get (r03 spent
3 re-proving q32/q89/q95 while 34 queries had no driver row at all).

Since r09 the order is COMPUTED (registry.priority_order) from the
committed CORRECTNESS_r*.json artifacts — RECHECK (changed oracles) first,
then never-checked queries, then settled queries stalest-green-row first —
so these tests assert the *policy properties* hold on whatever artifacts
are on disk, rather than pinning a hand-maintained name list (the r07/r08
failure mode: the list tripped its own no-replay guard two rounds running).
"""

from __future__ import annotations

import json
from pathlib import Path

from discogs_load_spark.queries import REGISTRY
from discogs_load_spark.queries.registry import (
    RECHECK,
    _newest_green_round,
    priority_order,
)

REPO = Path(__file__).resolve().parent.parent
GATE_BUDGET = 50


def _settled_queries() -> set[str]:
    """A query is *settled* once any round gave it a fully green row
    (rows/schema/hash all true) or its by-design rows-only row
    (``err: 'no_oracle'`` — the best row an oracle-less query can earn).
    Independent re-derivation; must agree with registry._newest_green_round."""
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
    window = [n for n in priority_order() if n in REGISTRY][:GATE_BUDGET]
    # All-settled state: nothing to outrank, the window is free for
    # regression re-proof rotation (max default=0 keeps the slice empty).
    # RECHECK entries are settled-but-changed: deliberately at the head.
    last_unsettled = max(
        (i for i, n in enumerate(window) if n not in settled), default=0
    )
    misplaced = [
        n for n in window[:last_unsettled] if n in settled and n not in RECHECK
    ]
    assert not misplaced, (
        "green queries outrank unverified ones in the gate window "
        f"(re-burning driver slots): {misplaced}"
    )


def test_every_unsettled_query_gets_a_gate_slot():
    settled = _settled_queries()
    unsettled = [n for n in REGISTRY if n not in settled]
    window = set(priority_order()[:GATE_BUDGET])
    if len(unsettled) <= GATE_BUDGET:
        left_out = [n for n in unsettled if n not in window]
        assert not left_out, (
            f"unverified queries missing from the gate window: {left_out}"
        )
    else:
        # more debt than budget: at least insist the whole window is debt
        settled_in_window = [
            n for n in priority_order()[:GATE_BUDGET] if n in settled
        ]
        assert not settled_in_window


def test_gate_window_does_not_replay_previous_round():
    """r05 failure mode (VERDICT r05 item 1): the window shipped unchanged,
    so the driver re-verified the previous round's exact 50 queries and the
    round's changed oracles got no row. The computed order makes this hold
    by construction (last round's rows are the freshest, so they sort to
    the back) — keep the tripwire anyway: it is the property the
    derivation exists to guarantee. RECHECK names are the sanctioned
    exception (changed oracles re-proved on purpose)."""
    artifacts = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert artifacts
    newest = set(json.loads(artifacts[-1].read_text()))
    window = [n for n in priority_order() if n in REGISTRY][:GATE_BUDGET]
    replayed = [n for n in window if n in newest and n not in RECHECK]
    assert len(replayed) <= 5, (
        f"{len(replayed)} of {GATE_BUDGET} gate slots replay queries already "
        f"checked in {artifacts[-1].name} — {replayed[:10]}"
    )


def test_gate_window_ordering_policy():
    """The head is RECHECK (changed oracles), then queries with no driver
    row yet (registration order), then settled queries ordered oldest
    newest-green-row first; rows-only-by-design queries (err='no_oracle')
    never occupy a rotation slot while any hash-verifiable query is
    staler."""
    order = priority_order()
    newest = _newest_green_round()
    reg_order = {n: i for i, n in enumerate(REGISTRY)}

    head = [n for n in RECHECK if n in REGISTRY]
    assert order[: len(head)] == head

    rest = order[len(head):]
    unsettled = [n for n in rest if n not in newest]
    # every unsettled query precedes every settled one
    if unsettled:
        last_unsettled = max(rest.index(n) for n in unsettled)
        settled_before = [
            n for n in rest[:last_unsettled] if n in newest
        ]
        assert not settled_before, settled_before
        assert unsettled == sorted(unsettled, key=reg_order.__getitem__)

    settled = [n for n in rest if newest.get(n, -2) >= 0]
    rounds = [newest[n] for n in settled]
    assert rounds == sorted(rounds), "settled queries not stalest-first"

    no_oracle = [n for n in rest if newest.get(n) == -1]
    if no_oracle and settled:
        assert min(rest.index(n) for n in no_oracle) > max(
            rest.index(n) for n in settled
        ), "rows-only-by-design query outranks a hash-verifiable one"


def test_every_oracle_is_single_statement():
    """The driver wraps each oracle in its own execute; a stray semicolon
    (even inside a SQL comment) could split or abort that wrapper."""
    bad = [n for n, s in REGISTRY.items() if s.oracle and ";" in s.oracle]
    assert not bad, f"oracles containing ';': {bad}"


def test_later_green_row_overrides_rows_only_pin(tmp_path, monkeypatch):
    """ADVICE r09: a query that was rows-only (err='no_oracle') in an
    early round but later grew an oracle and earned a fully green row
    must re-enter staleness rotation from that round — the newest
    round's verdict wins. The reverse order (oracle removed) re-pins."""
    import discogs_load_spark.queries.registry as reg

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "err": None}
    rows_only = {"rows_match": True, "schema_match": False,
                 "hash_match": False, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "grew_oracle": rows_only, "lost_oracle": green, "always_green": green,
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "grew_oracle": green, "lost_oracle": rows_only,
    }))
    monkeypatch.setattr(reg, "_REPO_ROOT", tmp_path)
    newest = reg._newest_green_round()
    assert newest["grew_oracle"] == 2   # rotates again, from round 2
    assert newest["lost_oracle"] == -1  # newest verdict is rows-only
    assert newest["always_green"] == 1
