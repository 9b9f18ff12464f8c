"""Registry / driver-contract invariants (VERDICT r3 items 1 and 8).

Locks in the rotation discipline: every registered query must either
already own a green driver CORRECTNESS row, sit in the current first-50
driver window, or be explicitly queued in _NEXT_ROTATION — so no query
can silently fall out of driver verification. Also enforces that every
query has a DuckDB oracle (zero rows-only checks) and that the queue
only shrinks (nothing already green may occupy a queue slot).
"""

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

_WINDOW_SIZE = 50  # the driver checks the first 50 registered queries


def _registry_names():
    queries, oracles = entry_mod._registry()
    return list(queries.keys()), set(oracles.keys())


def _driver_green():
    """Queries whose LATEST driver check is a full hash-match.

    Files are ordered by ROUND NUMBER, not lexicographically — from
    round 10 on, "r10" sorts before "r2" as a string, which would let
    a stale green row mask a later failed re-check."""
    import re

    def round_no(path):
        return int(re.search(r"_r(\d+)\.json$", path).group(1))

    verdicts = {}
    for path in sorted(
        glob.glob("/root/repo/CORRECTNESS_r*.json"), key=round_no
    ):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                verdicts[name] = bool(row.get("hash_match"))
    return {name for name, ok in verdicts.items() if ok}


def test_every_query_has_an_oracle():
    names, oracles = _registry_names()
    missing = [n for n in names if n not in oracles]
    assert not missing, f"queries without a DuckDB oracle: {missing}"


def test_window_is_exactly_the_first_50():
    names, _ = _registry_names()
    assert names[:_WINDOW_SIZE] == entry_mod._DRIVER_WINDOW
    assert len(entry_mod._DRIVER_WINDOW) == _WINDOW_SIZE
    assert len(set(entry_mod._DRIVER_WINDOW)) == _WINDOW_SIZE


def test_rotation_covers_the_registry():
    """greens ∪ window ∪ queue must cover every registered query."""
    names, _ = _registry_names()
    covered = (
        _driver_green()
        | set(entry_mod._DRIVER_WINDOW)
        | set(entry_mod._NEXT_ROTATION)
    )
    uncovered = [n for n in names if n not in covered]
    assert not uncovered, (
        "queries outside the driver rotation (not green-checked, not in "
        f"the window, not queued): {uncovered}"
    )


def test_rotation_queue_only_shrinks():
    """A green-checked query must leave the queue — the queue holds
    only work that still needs a driver row."""
    stale = sorted(set(entry_mod._NEXT_ROTATION) & _driver_green())
    assert not stale, f"already driver-green but still queued: {stale}"


def test_priority_lists_are_disjoint_and_registered():
    names, _ = _registry_names()
    window = set(entry_mod._DRIVER_WINDOW)
    queue = set(entry_mod._NEXT_ROTATION)
    backlog = set(entry_mod._CHECKED_BACKLOG)
    assert not window & queue
    assert not window & backlog
    assert not queue & backlog
    all_listed = window | queue | backlog
    unregistered = sorted(all_listed - set(names))
    assert not unregistered, f"priority names not registered: {unregistered}"
