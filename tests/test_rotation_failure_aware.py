"""The driver-rotation ordering must be failure-aware (VERDICT r6 item 2).

External correctness sweeps sample a ~50-query prefix of ``queries()``.
A query whose latest CORRECTNESS_r*.json cell is RED must be treated as
never-verified (stamp 0) so its fix is re-verified next round, instead
of carrying the freshest stamp and sinking to the back of the queue.

VERDICT r7 item 1: these tests assert the rotation *invariants* on
synthetic artifact fixtures in ``tmp_path`` — never the transient state
of the live repo artifacts, which legitimately changes every round the
driver flips a query red<->green.  One live smoke at the bottom asserts
only round-independent properties.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry
from sayn_spark.functions import REGISTRY

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}


def _write(tmp_path, rnd: int, cells: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(cells))


def test_red_with_no_later_green_has_stamp_zero(tmp_path):
    """Invariant (a): red-at-N with no later green => never-verified."""
    _write(tmp_path, 3, {"q_a": GREEN, "q_b": RED})
    hist = entry._driver_history(str(tmp_path))
    assert hist.get("q_a") == 3
    assert "q_b" not in hist  # stamp 0: sorts to the queue head


def test_red_then_green_stamps_at_the_green_round(tmp_path):
    """Invariant (b): red-at-N, green-at-N+1 => stamp N+1."""
    _write(tmp_path, 3, {"q_x": RED})
    _write(tmp_path, 4, {"q_x": GREEN})
    hist = entry._driver_history(str(tmp_path))
    assert hist.get("q_x") == 4


def test_green_then_red_reverts_to_never_verified(tmp_path):
    """A newer failure must erase an older green stamp."""
    _write(tmp_path, 3, {"q_y": GREEN})
    _write(tmp_path, 5, {"q_y": RED})
    hist = entry._driver_history(str(tmp_path))
    assert "q_y" not in hist


def test_green_stamps_never_regress(tmp_path):
    """Invariant (c): an older red must not mask a newer green, and a
    repeat green keeps the max round."""
    _write(tmp_path, 2, {"q_z": RED})
    _write(tmp_path, 3, {"q_z": GREEN})
    _write(tmp_path, 4, {"q_z": GREEN})
    hist = entry._driver_history(str(tmp_path))
    assert hist.get("q_z") == 4


def test_survives_a_future_round_artifact(tmp_path):
    """Simulate a hypothetical next-round artifact flipping states: the
    ordering keys update, no assertion here depends on which round it
    is (the r7 failure mode)."""
    _write(tmp_path, 7, {"q_old_red": RED, "q_old_green": GREEN})
    _write(tmp_path, 8, {"q_old_red": GREEN, "q_old_green": RED})
    hist = entry._driver_history(str(tmp_path))
    assert hist.get("q_old_red") == 8
    assert "q_old_green" not in hist


def test_stale_first_ordering_on_synthetic_history(tmp_path):
    """Never-verified queries lead the non-sentinel tail; fresher
    stamps sink behind staler ones."""
    names = [n for n in REGISTRY if n not in entry._SENTINELS]
    fresh, stale = names[0], names[1]
    _write(tmp_path, 4, {stale: GREEN})
    _write(tmp_path, 7, {fresh: GREEN})
    ordered = entry._ordered_names(str(tmp_path))
    assert ordered[: len(entry._SENTINELS)] == entry._SENTINELS
    tail = ordered[len(entry._SENTINELS) :]
    never = [n for n in tail if n not in (fresh, stale)]
    # every never-verified name precedes both stamped names
    assert max(tail.index(n) for n in never) < tail.index(stale) < tail.index(fresh)


def test_unreadable_artifact_is_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r09.json").write_text("{not json")
    _write(tmp_path, 3, {"q_ok": GREEN})
    hist = entry._driver_history(str(tmp_path))
    assert hist == {"q_ok": 3}


def test_entry_green_shapes():
    assert entry._entry_green(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    )
    assert not entry._entry_green(
        {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    )
    assert not entry._entry_green({"rows_match": True, "err": "boom"})
    # rows-only cells (no hash_match key) count as green when matched.
    assert entry._entry_green({"rows_match": True, "schema_match": True, "err": None})
    assert not entry._entry_green({})
    assert not entry._entry_green(None)


def test_live_artifacts_smoke():
    """Round-independent properties of the real repo artifacts only:
    sentinels lead, every registered query is emitted exactly once."""
    names = list(entry.queries())
    assert names[: len(entry._SENTINELS)] == entry._SENTINELS
    assert sorted(names) == sorted(REGISTRY)
    assert len(names) == len(set(names))
    # stamps, when present, are positive round numbers
    hist = entry._driver_history()
    assert all(isinstance(r, int) and r >= 1 for r in hist.values())


def test_evidence_throughput_guard():
    """VERDICT r7 item 6: the driver verifies ~50 queries per round, so
    the number of never-verified (stamp-0) registry entries at HEAD
    must stay within one round's verification throughput — otherwise
    in-round additions outrun the external evidence they need."""
    hist = entry._driver_history()
    stamp_zero = [n for n in REGISTRY if n not in hist]
    assert len(stamp_zero) <= 50, (
        f"{len(stamp_zero)} stamp-0 queries exceed one driver round's "
        f"~50-query sample: {stamp_zero[:10]}..."
    )
