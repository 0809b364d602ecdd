"""Round-15 instruments: the bench sentinel-drift flag (VERDICT r14
item 9) and the w<=32 packed-band mask (ADVICE r14; the banded-vs-
allpairs half lives in test_dedup_banding.py)."""

from __future__ import annotations


def test_sentinel_drift_flag_thresholds():
    from bench import drift_flag

    # calm sweep: 0.30 -> 0.29 is 3% drift, not contamination
    ratio, bad = drift_flag(0.30, 0.29)
    assert ratio == 0.967 and bad is False
    # the r14 driver sweep shape: 0.301 -> 0.190 (-37%) must flag
    ratio, bad = drift_flag(0.301, 0.190)
    assert bad is True
    # upward drift flags symmetrically
    _, bad = drift_flag(0.20, 0.26)
    assert bad is True
    # degenerate sentinel never divides by zero
    assert drift_flag(0.0, 0.2) == (None, False)


def test_bench_json_carries_drift_keys():
    """The contract keys must be additions-only: value/queries stay,
    the drift pair rides along."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    for key in ("sentinel_drift", "sentinel_contaminated", '"queries"', '"value"'):
        assert key in src
