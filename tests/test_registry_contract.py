"""Driver-contract invariants: the registry and its priority ordering must
stay in lockstep — a key missing from DRIVER_PRIORITY silently jumps to the
FRONT of the driver's 50-key correctness window (unlisted-first rule) and a
stale entry wastes a window slot."""

from __future__ import annotations

from debias_spark.registry import DRIVER_PRIORITY, load_all_queries, priority_ordered


def test_priority_list_matches_registry_exactly():
    specs = load_all_queries()
    assert set(DRIVER_PRIORITY) == set(specs), (
        set(DRIVER_PRIORITY) ^ set(specs)
    )
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY)), "duplicates"


def test_priority_ordering_is_total_and_stable():
    order = list(priority_ordered())
    assert order == [k for k in DRIVER_PRIORITY if k in set(order)]
    assert len(order) == len(load_all_queries())


def test_every_key_has_callable_and_section():
    for name, spec in load_all_queries().items():
        assert callable(spec.fn), name
        assert spec.section, name
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name
