"""Native host-ops library parity tests vs cv2 oracles."""

import numpy as np
import pytest

from pasta_gan_tpu import native

cv2 = pytest.importorskip("cv2")

needs_native = pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")


@needs_native
@pytest.mark.parametrize("border", ["constant", "replicate"])
def test_native_warp_matches_cv2(border):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 48, 3)).astype(np.float32)
    src = np.asarray([[10, 8], [12, 50], [40, 52], [38, 6]], np.float32)
    dst = np.asarray([[0, 0], [0, 32], [32, 32], [32, 0]], np.float32)
    M = cv2.getPerspectiveTransform(src, dst)
    ours = native.warp_perspective(img, M, (32, 32), border)
    mode = cv2.BORDER_REPLICATE if border == "replicate" else cv2.BORDER_CONSTANT
    theirs = cv2.warpPerspective(img, M, (32, 32), borderMode=mode)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-3)


@needs_native
def test_native_fill_polygon_matches_cv2():
    pts = np.asarray([[5, 5], [40, 8], [44, 50], [8, 44]], np.float64)
    ours = native.fill_polygon(pts, 64, 64)
    ref = np.zeros((64, 64), np.uint8)
    cv2.fillPoly(ref, [pts.astype(np.int32)], 1)
    # scanline-center vs integer-vertex rasterization differ only on edges
    diff = np.abs(ours - ref.astype(np.float32))
    assert diff.mean() < 0.03


@needs_native
def test_native_dilate_matches_cv2():
    rng = np.random.default_rng(1)
    m = (rng.uniform(size=(64, 64)) > 0.95).astype(np.float32)
    for k in (16, 25):
        ours = native.dilate_box(m, k)
        theirs = cv2.dilate(m, np.ones((k, k), np.uint8), iterations=1)
        np.testing.assert_array_equal(ours, theirs)


@needs_native
def test_native_draw_line_runs():
    img = np.zeros((32, 32, 3), np.uint8)
    out = native.draw_line(img, (2, 2), (28, 20), (255, 0, 0), 2)
    assert out.sum() > 0
