"""Round-14: the bench artifact self-flags each timing against the
stored local noise band (verdict r13 item #7) — one methodology,
owned by tools/bench_band.band_flag, shared by the --baseline
comparison and bench.py's per-query annotation."""

from tools.bench_band import band_flag


def test_inside_when_within_measured_band():
    assert band_flag(1.3, 1.0, 0.50) == "inside"


def test_floor_widens_accidentally_tight_bands():
    # 8% move, 1% measured spread: the 10% floor absorbs it
    assert band_flag(1.08, 1.0, 0.01) == "inside"


def test_absolute_floor_suppresses_small_moves():
    # 20% over a 10% band but only 0.2 s absolute — noise
    assert band_flag(1.2, 1.0, 0.05) == "inside"


def test_above_and_below():
    assert band_flag(2.0, 1.0, 0.10) == "above"
    assert band_flag(0.5, 1.0, 0.10) == "below"
