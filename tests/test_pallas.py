"""Pallas kernel parity tests (interpret mode on CPU — the reference's
asm-vs-C matrix becomes pallas-vs-pure-jax, SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from compv_tpu.features.fast import fast_nms, fast_strengths
from compv_tpu.ops.pallas.fast_kernel import fast_strengths_nms_pallas


@pytest.fixture(scope="module")
def corner_img():
    rs = np.random.default_rng(11)
    img = rs.integers(90, 110, (128, 192), dtype=np.uint8).astype(np.uint8)
    img[10:20, 10:25] = 220
    img[30:40, 35:50] = 15
    img[100:118, 100:140] = 240
    img[24, 55] = 250
    return img


class TestFastPallasParity:
    @pytest.mark.parametrize("n", [9, 12])
    @pytest.mark.parametrize("threshold", [10, 20])
    def test_strengths_parity(self, corner_img, threshold, n):
        want = np.asarray(fast_strengths(jnp.asarray(corner_img), threshold, n))
        got = np.asarray(fast_strengths_nms_pallas(
            jnp.asarray(corner_img), threshold, n, nms=False, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_nms_parity(self, corner_img):
        want = np.asarray(fast_nms(fast_strengths(jnp.asarray(corner_img), 20, 9)))
        got = np.asarray(fast_strengths_nms_pallas(
            jnp.asarray(corner_img), 20, 9, nms=True, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_odd_sizes(self):
        rs = np.random.default_rng(3)
        img = rs.integers(0, 255, (97, 131), dtype=np.uint8)
        want = np.asarray(fast_nms(fast_strengths(jnp.asarray(img), 20, 9)))
        got = np.asarray(fast_strengths_nms_pallas(
            jnp.asarray(img), 20, 9, nms=True, interpret=True))
        np.testing.assert_array_equal(got, want)
