"""The driver-rotation ordering must be failure-aware (VERDICT r6 item 2).

External correctness sweeps sample a ~50-query prefix of ``queries()``.
A query whose latest CORRECTNESS_r*.json cell is RED must be treated as
never-verified (stamp 0) so its fix is re-verified next round, instead
of carrying the freshest stamp and sinking to the back of the queue.
"""

from __future__ import annotations

import __spark_entry__ as entry

R6_RED = [
    "q_dedup_cluster_profile",
    "q_mixture_temperature",
    "q_ngram_novelty",
    "q_perplexity_buckets",
]


def test_failed_entries_do_not_advance_stamp():
    hist = entry._driver_history()
    for name in R6_RED:
        # r6's artifact marks these hash_match=False; any older green
        # round must not survive a newer failure.
        assert hist.get(name, 0) < 6, (name, hist.get(name))


def test_red_queries_lead_the_emission_order():
    names = list(entry.queries())
    for name in R6_RED:
        assert name in names[:50], (name, names.index(name))


def test_green_cells_still_stamp():
    hist = entry._driver_history()
    # q01 has been green in every sampled round; it must carry a stamp.
    assert hist.get("q01_pricing_summary", 0) >= 1


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
