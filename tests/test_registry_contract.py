"""Driver-contract invariants: the priority ordering the driver consumes is
DERIVED from the committed CORRECTNESS_r*.json artifacts (round-8 rebuild of
the twice-stale hand-maintained list), so these tests pin the derivation:
every unproven key must lead the 50-key window, failures and changed keys
must precede greens, and the order must stay a total permutation of the
registry."""

from __future__ import annotations

from debias_spark.registry import (
    CHANGED_SINCE_CHECK,
    DEFERRED_NEW_KEYS,
    _correctness_evidence,
    _record_green,
    changed_pending,
    load_all_queries,
    priority_ordered,
)


def test_priority_ordering_is_total_permutation():
    specs = load_all_queries()
    order = list(priority_ordered())
    assert len(order) == len(set(order)), "duplicates"
    assert set(order) == set(specs), set(order) ^ set(specs)


def test_never_driver_checked_keys_lead_the_window():
    """The round-7/round-6 stale-priority defect, made structurally
    impossible: every registry key absent from the committed CORRECTNESS
    files must sit at the HEAD of priority_ordered() (before any key the
    driver already proved) — the driver checks exactly the first 50 keys,
    so an unproven key behind a proven one is a wasted round of evidence.
    Keys in DEFERRED_NEW_KEYS are the sanctioned exception: built after
    the window filled, they slot after the failed/changed re-proofs but
    still before every green."""
    specs = load_all_queries()
    ev = _correctness_evidence()
    never = {k for k in specs if k not in ev} - set(DEFERRED_NEW_KEYS)
    order = list(priority_ordered())
    head = set(order[: len(never)])
    assert head == never, (
        f"never-checked keys not leading: missing from head "
        f"{sorted(never - head)}; proven keys in head {sorted(head - never)}"
    )


def test_failed_changed_and_deferred_precede_all_greens():
    specs = load_all_queries()
    ev = _correctness_evidence()
    order = list(priority_ordered())
    pos = {k: i for i, k in enumerate(order)}
    needs_proof = set(changed_pending(specs, ev)) | {
        k
        for k in specs
        if k not in ev
        or not _record_green(ev[k][2], specs[k].oracle is not None)
    }
    first_green = min(
        (pos[k] for k in specs if k not in needs_proof), default=len(order)
    )
    late = [k for k in needs_proof if pos[k] > first_green]
    assert not late, f"keys needing proof behind a green: {late}"


def test_green_tail_is_stalest_first():
    specs = load_all_queries()
    ev = _correctness_evidence()
    order = list(priority_ordered())
    pending = set(changed_pending(specs, ev))
    tail = [
        k
        for k in order
        if k in ev
        and k not in pending
        and _record_green(ev[k][2], specs[k].oracle is not None)
    ]
    keys = [(ev[k][0], ev[k][1]) for k in tail]
    assert keys == sorted(keys), "green tail must be (round, index)-sorted"


def test_window_covers_every_key_needing_proof():
    """(new + failed + changed), excluding the consciously DEFERRED new
    keys, must fit the driver's 50-key window; a 51st unproven key would
    otherwise silently wait a full round — flag it here so the builder
    either trims CHANGED_SINCE_CHECK or defers the key explicitly."""
    specs = load_all_queries()
    ev = _correctness_evidence()
    pending = set(changed_pending(specs, ev))
    needing = [
        k
        for k in specs
        if (k not in ev and k not in DEFERRED_NEW_KEYS)
        or (
            k in ev
            and not _record_green(ev[k][2], specs[k].oracle is not None)
        )
        or (k in ev and k in pending)
    ]
    assert len(needing) <= 50, (
        f"{len(needing)} keys need driver proof but the window holds 50: "
        f"defer new keys (DEFERRED_NEW_KEYS) or trim CHANGED_SINCE_CHECK"
    )


def test_every_key_has_callable_and_section():
    for name, spec in load_all_queries().items():
        assert callable(spec.fn), name
        assert spec.section, name
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name


# Types the driver's value-hash serializes differently from Spark's output
# even when every value is numerically identical (round-3 adjudication:
# embedding_quantize_int8 / tpch_q11 false hash-fails — DuckDB sum(BIGINT)
# and list_sum return HUGEINT).  Oracles must CAST these to BIGINT/DOUBLE.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


def test_no_oracle_returns_hugeint_or_decimal():
    """Execute every oracle's type signature at sf0.001 and assert no result
    column carries a DuckDB type whose cell serialization diverges from the
    Spark-side long/double (the round-3 false-hash-fail class)."""
    from debias_spark.testing import duck_connection

    con = duck_connection("/root/testdata/sf0.001")
    bad = []
    for name, spec in load_all_queries().items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in _BANNED_DUCK_TYPES):
                bad.append((name, col, t))
    assert not bad, f"oracles emitting driver-hash-unsafe types: {bad}"


def test_no_oracle_rounds_a_double_mean():
    """Regression guard for the rounding-tie class (round-5 Y33): Spark's
    round() HALF_UPs the shortest-decimal repr while DuckDB rounds the
    binary double, so `round(avg(<double>))` oracle pairs diverge whenever
    the mean lands on an exact .xx5 decimal tie.  The sanctioned emission
    is the floor-eps integer recipe `floor(x*scale + 0.5 + 1e-9)`
    (llm_ops13.py flesch) — assert no declared oracle still carries the
    fragile form (stddev/var share the same many-term-double risk)."""
    import re

    fragile = re.compile(r"round\s*\(\s*(avg|mean|stddev|var_samp|var_pop)\s*\(", re.I)
    bad = [
        name
        for name, spec in load_all_queries().items()
        if spec.oracle is not None and fragile.search(spec.oracle)
    ]
    assert not bad, f"oracles still using round(avg/stddev(...)): {bad}"


def test_no_oracle_exceeds_runtime_ceiling():
    """Execute every oracle at sf0.01 (the driver's own t2 scale) and
    assert none takes more than 5 s.  This is the regression guard for
    the round-4 CTE-inlining class: DuckDB re-evaluates an inlined CTE
    per reference, so an unrolled iterative oracle whose round CTEs are
    multi-referenced blows up exponentially in rounds (k-core measured
    112 s, BPE 9.3 s — both now AS MATERIALIZED and ~0.1 s).  Normal
    oracles run well under 1 s at this scale; 5 s leaves margin for a
    loaded host while still catching any exponential chain."""
    import time

    from debias_spark.testing import duck_connection

    con = duck_connection("/root/testdata/sf0.01")
    slow = []
    for name, spec in load_all_queries().items():
        if spec.oracle is None:
            continue
        t0 = time.perf_counter()
        con.sql(spec.oracle).fetchall()
        dt = time.perf_counter() - t0
        if dt > 5.0:
            # the ceiling is load-sensitive: a legitimately ~1s oracle can
            # flake past 5s on a busy host.  The exponential-blowup class
            # this guards against (k-core 112s, BPE 9.3s pre-MATERIALIZED)
            # doesn't pass on retry — so retry once before declaring slow.
            t0 = time.perf_counter()
            con.sql(spec.oracle).fetchall()
            dt = time.perf_counter() - t0
            if dt > 5.0:
                slow.append((name, round(dt, 2)))
    assert not slow, f"oracles over the 5s ceiling at sf0.01 (after retry): {slow}"


def test_floor_eps_oracles_keep_boundary_margin():
    """The Y33 rounding-tie regression gate, generalized: no oracle that
    emits integers via floor(x*scale + 0.5 + 1e-9) may have a
    TRANSCENDENTAL-math value within 2e-9 of a floor boundary on the
    current testdata (Java Math.log and C libm can disagree in the last
    ulp, so a near-boundary log-derived value could floor differently
    per engine).  Rational near-boundary hits are the benign exact-tie
    class — both engines evaluate them bit-identically and the eps
    breaks the tie consistently — and are reported, not failed, by
    tools/float_margin_audit.py."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.float_margin_audit import audit

    fragile, _ties = audit("/root/testdata/sf0.001")
    assert not fragile, (
        f"transcendental floor-eps oracles within 2e-9 of a boundary: "
        f"{fragile} — widen the emission scale or restate the formula "
        f"over integers (see tools/float_margin_audit.py)"
    )


def test_changed_entries_drain_once_reproven():
    """A CHANGED_SINCE_CHECK entry stops consuming a window slot as soon
    as a CORRECTNESS round >= its recorded round shows the key green —
    the manual-drain failure mode cannot waste round-N+1 slots."""
    specs = load_all_queries()
    ev = _correctness_evidence()
    any_key = next(iter(CHANGED_SINCE_CHECK))
    need = CHANGED_SINCE_CHECK[any_key]
    fake_ev = dict(ev)
    fake_ev[any_key] = (
        need,
        0,
        {"err": None, "rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1},
    )
    assert any_key in changed_pending(specs, ev) or (
        any_key in ev
        and ev[any_key][0] >= need
        and _record_green(ev[any_key][2], specs[any_key].oracle is not None)
    )
    assert any_key not in changed_pending(specs, fake_ev)
    # and a pre-change green does NOT satisfy it
    stale_ev = dict(fake_ev)
    stale_ev[any_key] = (need - 1, 0, fake_ev[any_key][2])
    assert any_key in changed_pending(specs, stale_ev)
