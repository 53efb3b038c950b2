

# ---------------------------------------------------------------------------
# banding auto-tuner (MMDS §3.4 S-curve)
# ---------------------------------------------------------------------------


def test_banding_curve_endpoints_and_knee():
    import numpy as np

    from datasketches_cpp_spark.operators.lsh import banding_curve

    assert banding_curve(16, 8, 0.0) == 0.0
    assert banding_curve(16, 8, 1.0) == 1.0
    # the knee (1/b)^(1/r) sits where P crosses ~1-1/e of its rise
    knee = (1 / 16) ** (1 / 8)
    assert 0.3 < banding_curve(16, 8, knee) < 0.8
    # monotone in s
    s = np.linspace(0, 1, 101)
    p = banding_curve(16, 8, s)
    assert (np.diff(p) >= -1e-15).all()


def test_suggest_banding_tracks_target_and_budget():
    from datasketches_cpp_spark.operators.lsh import suggest_banding

    prev_rows = 0
    for t in (0.2, 0.4, 0.6, 0.8, 0.95):
        b = suggest_banding(128, t)
        assert b["bands"] * b["rows"] <= 128
        assert abs(b["threshold"] - t) < 0.12
        assert b["rows"] >= prev_rows  # higher target -> more rows per band
        prev_rows = b["rows"]


def test_suggest_banding_fn_weight_buys_recall():
    from datasketches_cpp_spark.operators.lsh import suggest_banding

    neutral = suggest_banding(128, 0.8, fn_weight=1.0)
    recall = suggest_banding(128, 0.8, fn_weight=10.0)
    assert recall["fn_area"] <= neutral["fn_area"]
    assert recall["threshold"] <= neutral["threshold"]


def test_suggest_banding_rejects_bad_target():
    import pytest

    from datasketches_cpp_spark.operators.lsh import suggest_banding

    with pytest.raises(ValueError):
        suggest_banding(128, 1.5)
