"""Golden-check plumbing of scripts/bench_scene.py.

Round-3 verdict missing #2: the old `height // 64` downsample factor (12 for
plush's 800^2 frames, /root/reference/configs/config_plush_render.py:19-21)
does not divide 800, so every plush bench crashed in the reshape before the
write/exists branches — the heaviest shipped workload could never be
golden-verified.  These tests pin the divisor-safe factor, the 800^2
write/check round trip on CPU, and the missing-golden hard failure.
"""

import numpy as np
import pytest

from scripts.bench_scene import (
    GOLDEN_PSNR_DB,
    _downsample_factor,
    _downsample_frame,
    check_golden,
)


def test_factor_512_matches_committed_goldens():
    # The carpet/grass goldens were written with f=8; the divisor-safe
    # factor must reproduce it so they stay valid.
    assert _downsample_factor(512, 512) == 8


@pytest.mark.parametrize(
    "h,w", [(800, 800), (512, 512), (100, 100), (66, 44), (63, 63), (1, 1)]
)
def test_factor_divides_any_frame(h, w):
    f = _downsample_factor(h, w)
    assert f >= 1 and h % f == 0 and w % f == 0
    color = np.zeros((h * w, 3), np.float32)
    alpha = np.zeros((h * w,), np.float32)
    small = _downsample_frame(color, alpha, h, w)
    assert small.shape == (h // f, w // f, 4)


def _frame(h, w, seed=0):
    rs = np.random.RandomState(seed)
    return rs.rand(h * w, 3).astype(np.float32), rs.rand(h * w).astype(np.float32)


def test_write_then_check_roundtrip_plush_shape(tmp_path):
    color, alpha = _frame(800, 800)
    p = str(tmp_path / "golden_scene_plush.npz")
    check_golden("plush", color, alpha, 800, 800, write_golden=True, path=p)
    check_golden("plush", color, alpha, 800, 800, path=p)


def test_divergent_frame_fails(tmp_path):
    color, alpha = _frame(128, 128)
    p = str(tmp_path / "golden_scene_x.npz")
    check_golden("x", color, alpha, 128, 128, write_golden=True, path=p)
    other, _ = _frame(128, 128, seed=1)
    with pytest.raises(AssertionError, match="diverged"):
        check_golden("x", other, alpha, 128, 128, path=p)


def test_missing_golden_is_hard_failure(tmp_path):
    color, alpha = _frame(64, 64)
    with pytest.raises(FileNotFoundError, match="write-golden"):
        check_golden("x", color, alpha, 64, 64, path=str(tmp_path / "nope.npz"))


def test_stale_resolution_golden_fails(tmp_path):
    color, alpha = _frame(128, 128)
    p = str(tmp_path / "golden_scene_x.npz")
    check_golden("x", color, alpha, 128, 128, write_golden=True, path=p)
    # 100^2 downsamples with f=1 -> 100x100, vs the golden's 64x64.
    big, big_a = _frame(100, 100)
    with pytest.raises(AssertionError, match="stale golden"):
        check_golden("x", big, big_a, 100, 100, path=p)


def test_psnr_floor_is_sane():
    assert 30.0 <= GOLDEN_PSNR_DB <= 80.0
