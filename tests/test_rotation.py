"""Check-rotation process guards (r12 verdict item #1: the CHECK_FIRST
rebuild was skipped for a round, so the driver re-verified the previous
window and the round's new operators accumulated no correctness
evidence). These tests make that failure mode loud in CI instead of a
judge finding a round later."""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# The driver checks this many queries() entries per round (registry.py
# ordering contract; see queries/__init__.py).
WINDOW = 50

# Names deliberately listed in CHECK_FIRST before their registration
# lands (the pre-listing pattern: the registry filters unknown names).
# Keep this EMPTY at round close — a name still here means the planned
# operator never landed, which should fail loudly, not silently drop
# out of the window.
PENDING_REGISTRATION: frozenset = frozenset()


def _driver_rows() -> set[str]:
    seen: set[str] = set()
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        seen.update(json.loads(f.read_text()).keys())
    return seen


def test_check_first_names_all_registered():
    """A typo in CHECK_FIRST is silently filtered by the registry and
    would silently evict a query from the verification window — every
    listed name must be registered (or explicitly pending above)."""
    from cheetah_spark.queries import CHECK_FIRST
    from cheetah_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    unknown = set(CHECK_FIRST) - set(REGISTRY) - PENDING_REGISTRATION
    assert not unknown, f"CHECK_FIRST names not registered: {sorted(unknown)}"


def test_check_first_has_no_duplicates():
    from cheetah_spark.queries import CHECK_FIRST

    dupes = {n for n in CHECK_FIRST if CHECK_FIRST.count(n) > 1}
    assert not dupes, f"duplicate CHECK_FIRST entries: {sorted(dupes)}"


def test_driver_unverified_queries_lead_the_window():
    """Every registered query with NO driver CORRECTNESS row across all
    committed rounds must sit inside the next driver window (the first
    WINDOW entries of queries() order) — otherwise a new operator ships
    another round with local-oracle evidence only."""
    from cheetah_spark.registry import REGISTRY, _ensure_loaded, all_queries

    _ensure_loaded()
    seen = _driver_rows()
    missing = set(REGISTRY) - seen
    head = set(list(all_queries())[:WINDOW])
    outside = missing - head
    assert not outside, (
        f"queries with no driver correctness row outside the "
        f"{WINDOW}-slot window: {sorted(outside)}"
    )
