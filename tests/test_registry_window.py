"""Registry-layout invariants (round-3 consolidation contract).

The external correctness gate verifies the alphabetically-first 50
registered queries. These tests pin the layout so future additions can't
silently push primary evidence out of the verified window: new operators
join an existing family, take a z_ name, or consciously rebalance the
window (and update this pin).
"""

from __future__ import annotations

import d3d_etl_spark.queries as qmod
from d3d_etl_spark.queries.registry import REGISTRY

qmod.load_all()

WINDOW = 50


def test_primary_window_is_fully_oracled():
    """Every query inside the 50-row verify window must carry an oracle —
    a rows-only query in the window wastes a hash-checked slot."""
    names = sorted(REGISTRY)
    primaries = names[:WINDOW]
    missing = [n for n in primaries if REGISTRY[n].oracle is None]
    assert not missing, f"rows-only queries occupy verify-window slots: {missing}"


def test_supplementary_tier_is_z_prefixed():
    """Everything outside the window must be there BY CHOICE (z_ prefix) —
    an unprefixed query past position 50 means primary evidence silently
    fell out of the gate."""
    names = sorted(REGISTRY)
    # exactly-50 primaries: with 49 the alphabetically-first z_ query would
    # slide INTO the window and both slice-based checks would still pass,
    # silently under-filling the gate
    n_primary = sum(not n.startswith("z_") for n in names)
    assert n_primary == WINDOW, f"expected exactly {WINDOW} primary queries, got {n_primary}"
    overflow = [n for n in names[WINDOW:] if not n.startswith("z_")]
    assert not overflow, (
        f"non-z_ queries outside the {WINDOW}-row verify window: {overflow} — "
        "merge them into a family, z_-prefix them, or rebalance the window"
    )
    # and the z_ tier really does sort after every primary
    assert all(n.startswith("z_") for n in names[WINDOW:])


def test_rows_only_queries_are_supplementary():
    """Every registered query carries a SQL oracle — rows-only = 0 since
    round 9. The graduation history: the driver-loop trainers in round 5
    (chained-CTE trajectory unrolls), z_fsm_funnel in round 6 (closed
    relational form — its 3-state machine reduces to view-segment
    windows), and the two end-to-end narration-FSM pipelines in round 9
    (z_pbp_dag: the board's re24 sum became a 1e-9-scaled-long aggregate;
    z_pbp_war: crc32 team ids recomputed from first principles in
    recursive SQL, quantized linear-weight/woba_scale means). This pin
    keeps the registry at full oracle coverage: a new oracle-less
    registration must either gain an oracle or update this test with its
    documented reason."""
    rows_only = sorted(n for n, q in REGISTRY.items() if q.oracle is None)
    assert rows_only == []
