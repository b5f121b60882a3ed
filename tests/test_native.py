"""Native C data-path kernels vs numpy reference."""

import numpy as np
import pytest

from gesturediffusion_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


class TestNativeKernels:
    def test_window_znorm_transpose(self, lib):
        rs = np.random.RandomState(0)
        src = rs.randn(100, 24).astype(np.float32)
        mean = rs.randn(24).astype(np.float32)
        std = (rs.rand(24).astype(np.float32) + 0.5)
        out = native.window_znorm_transpose(src, 30, 40, mean, std)
        expected = ((src[30:70] - mean) / std).T
        np.testing.assert_allclose(out, expected, rtol=2e-5, atol=1e-5)

    def test_window_pads_past_end(self, lib):
        rs = np.random.RandomState(1)
        src = rs.randn(50, 8).astype(np.float32)
        mean = np.zeros(8, np.float32)
        std = np.ones(8, np.float32)
        out = native.window_znorm_transpose(src, 40, 20, mean, std)
        np.testing.assert_allclose(out[:, :10], src[40:50].T, atol=1e-6)
        np.testing.assert_allclose(out[:, 10:], 0.0)

    def test_batch_znorm_transpose(self, lib):
        rs = np.random.RandomState(2)
        src = rs.randn(4, 16, 12).astype(np.float32)
        mean = rs.randn(12).astype(np.float32)
        std = rs.rand(12).astype(np.float32) + 0.5
        out = native.batch_znorm_transpose(src, mean, std)
        expected = ((src - mean) / std).transpose(0, 2, 1)
        np.testing.assert_allclose(out, expected, rtol=2e-5, atol=1e-5)

    def test_lengths_to_mask(self, lib):
        mask = native.lengths_to_mask_native(np.asarray([3, 5, 0]), 6)
        expected = np.arange(6)[None] < np.asarray([3, 5, 0])[:, None]
        np.testing.assert_array_equal(mask, expected)

    def test_preemphasis(self, lib):
        rs = np.random.RandomState(3)
        x = rs.randn(1000).astype(np.float32)
        out = native.preemphasis(x, 0.97)
        expected = np.append(x[0], x[1:] - 0.97 * x[:-1])
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_fallback_matches_native(self, lib):
        """numpy fallback path computes identical results."""
        rs = np.random.RandomState(4)
        src = rs.randn(60, 10).astype(np.float32)
        mean = rs.randn(10).astype(np.float32)
        std = rs.rand(10).astype(np.float32) + 0.5
        out_native = native.window_znorm_transpose(src, 5, 30, mean, std)
        # force fallback
        saved, native._lib = native._lib, None
        try:
            out_np = native.window_znorm_transpose(src, 5, 30, mean, std)
        finally:
            native._lib = saved
        np.testing.assert_allclose(out_native, out_np, rtol=2e-5, atol=1e-5)
