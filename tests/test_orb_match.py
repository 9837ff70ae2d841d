"""ORB + brute-force matcher tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from compv_tpu.features.orb import (
    OrbConfig, brief_describe, brief_pattern, orb_detect_describe,
    patch_orientation,
)
from compv_tpu.matchers.bruteforce import (
    MatcherConfig, hamming_distance_matrix, knn_match, match_bruteforce,
    ratio_test,
)


@pytest.fixture(scope="module")
def textured_img():
    rs = np.random.default_rng(5)
    img = rs.integers(0, 255, (120, 160), dtype=np.uint8)
    # smooth it a bit so corners are localized
    from scipy import ndimage
    img = ndimage.gaussian_filter(img.astype(np.float32), 1.2)
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)
    return img


class TestPattern:
    def test_deterministic(self):
        p1 = brief_pattern()
        p2 = brief_pattern()
        np.testing.assert_array_equal(p1, p2)

    def test_within_disc(self):
        p = brief_pattern()
        for (x, y) in [(p[:, 0], p[:, 1]), (p[:, 2], p[:, 3])]:
            r = np.sqrt(x.astype(float) ** 2 + y.astype(float) ** 2)
            assert r.max() <= 15.5 - 1.0  # rotated samples stay in patch


class TestOrientation:
    def test_gradient_direction(self):
        """A patch brighter to the right => m10 > 0 => orientation ~ 0."""
        img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
        deg = np.asarray(patch_orientation(
            jnp.asarray(img), jnp.asarray([32.0]), jnp.asarray([32.0]),
            jnp.asarray([True])))[0]
        assert deg < 5 or deg > 355

    def test_gradient_down(self):
        img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[:, None], (1, 64))
        deg = np.asarray(patch_orientation(
            jnp.asarray(img), jnp.asarray([32.0]), jnp.asarray([32.0]),
            jnp.asarray([True])))[0]
        assert 85 < deg < 95  # +y direction (image down)


class TestDescriptor:
    def test_rotation_invariance(self, textured_img):
        """Descriptor at rotated keypoint with compensated angle must be
        close to the unrotated one (approximate due to resampling)."""
        from scipy import ndimage
        img = textured_img
        rot = ndimage.rotate(img, -30, reshape=False, order=1,
                             mode="nearest").astype(np.uint8)
        # keypoint at center; rotation about center maps center to center
        cx, cy = 80.0, 60.0
        from compv_tpu.ops.conv import gaussian_blur
        b0 = gaussian_blur(jnp.asarray(img), 5, 2.0)
        b1 = gaussian_blur(jnp.asarray(rot), 5, 2.0)
        o0 = patch_orientation(jnp.asarray(img), jnp.asarray([cx]),
                               jnp.asarray([cy]), jnp.asarray([True]))
        o1 = patch_orientation(jnp.asarray(rot), jnp.asarray([cx]),
                               jnp.asarray([cy]), jnp.asarray([True]))
        d0 = np.asarray(brief_describe(b0, jnp.asarray([cx]), jnp.asarray([cy]),
                                       o0, jnp.asarray([True])))[0]
        d1 = np.asarray(brief_describe(b1, jnp.asarray([cx]), jnp.asarray([cy]),
                                       o1, jnp.asarray([True])))[0]
        ham = int(np.sum(d0 != d1))
        assert ham < 80  # well under random (=128)

    def test_invalid_keypoints_zero(self, textured_img):
        from compv_tpu.ops.conv import gaussian_blur
        b = gaussian_blur(jnp.asarray(textured_img), 5, 2.0)
        d = np.asarray(brief_describe(b, jnp.asarray([50.0]), jnp.asarray([50.0]),
                                      jnp.asarray([0.0]), jnp.asarray([False])))
        assert d.sum() == 0


class TestOrbPipeline:
    def test_detect_describe_shapes(self, textured_img):
        cfg = OrbConfig(max_features=300, levels=4)
        res = orb_detect_describe(jnp.asarray(textured_img), cfg)
        assert res.keypoints.capacity == 300
        assert res.descriptors.shape == (300, 256)
        n = int(res.keypoints.count())
        assert n > 20
        v = np.asarray(res.keypoints.valid)
        assert (np.asarray(res.keypoints.strength)[v] > 0).all()
        packed = np.asarray(res.packed())
        assert packed.shape == (300, 32)

    def test_levels_populated(self, textured_img):
        cfg = OrbConfig(max_features=400, levels=4)
        res = orb_detect_describe(jnp.asarray(textured_img), cfg)
        v = np.asarray(res.keypoints.valid)
        lv = np.asarray(res.keypoints.level)[v]
        assert len(np.unique(lv)) >= 2  # multiple pyramid levels contribute

    def test_coords_level0_range(self, textured_img):
        cfg = OrbConfig(max_features=200, levels=4)
        res = orb_detect_describe(jnp.asarray(textured_img), cfg)
        v = np.asarray(res.keypoints.valid)
        x = np.asarray(res.keypoints.x)[v]
        y = np.asarray(res.keypoints.y)[v]
        h, w = textured_img.shape
        assert (x >= 0).all() and (x < w + 2).all()
        assert (y >= 0).all() and (y < h + 2).all()


class TestMatcher:
    def test_hamming_matrix_exact(self):
        rs = np.random.default_rng(0)
        q = rs.integers(0, 2, (20, 256)).astype(np.uint8)
        t = rs.integers(0, 2, (30, 256)).astype(np.uint8)
        d = np.asarray(hamming_distance_matrix(jnp.asarray(q), jnp.asarray(t)))
        want = (q[:, None, :] != t[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, want)

    def test_knn2_identity(self):
        rs = np.random.default_rng(1)
        t = rs.integers(0, 2, (50, 256)).astype(np.uint8)
        m = knn_match(jnp.asarray(t), jnp.asarray(t), k=2)
        np.testing.assert_array_equal(np.asarray(m.train_idx[0]), np.arange(50))
        np.testing.assert_array_equal(np.asarray(m.distance[0]), 0)
        assert (np.asarray(m.distance[1]) > 0).all()

    def test_cross_check(self):
        rs = np.random.default_rng(2)
        t = rs.integers(0, 2, (40, 256)).astype(np.uint8)
        q = t.copy()
        q[0] = 1 - q[0]  # corrupt one
        m = match_bruteforce(jnp.asarray(q), jnp.asarray(t),
                             MatcherConfig(knn=1, cross_check=True))
        v = np.asarray(m.valid[0])
        assert v[1:].all()

    def test_ratio_test(self):
        rs = np.random.default_rng(3)
        t = rs.integers(0, 2, (40, 256)).astype(np.uint8)
        m = knn_match(jnp.asarray(t), jnp.asarray(t), k=2)
        ok = np.asarray(ratio_test(m, 0.67))
        assert ok.all()  # d1=0 for exact matches

    def test_invalid_masking(self):
        rs = np.random.default_rng(4)
        q = rs.integers(0, 2, (10, 256)).astype(np.uint8)
        t = rs.integers(0, 2, (10, 256)).astype(np.uint8)
        tv = np.zeros(10, bool)
        tv[:3] = True
        m = knn_match(jnp.asarray(q), jnp.asarray(t),
                      train_valid=jnp.asarray(tv), k=2)
        assert (np.asarray(m.train_idx) < 3).all()

    def test_end_to_end_warp_match(self, textured_img):
        """Shift the image; matched keypoint displacement must equal the
        shift for most ratio-test survivors."""
        shift = 7
        img2 = np.roll(textured_img, shift, axis=1)
        cfg = OrbConfig(max_features=200, levels=2)
        r1 = orb_detect_describe(jnp.asarray(textured_img), cfg)
        r2 = orb_detect_describe(jnp.asarray(img2), cfg)
        m = knn_match(r1.descriptors, r2.descriptors,
                      r1.keypoints.valid, r2.keypoints.valid, k=2)
        ok = np.asarray(ratio_test(m, 0.8))
        assert ok.sum() >= 10
        x1 = np.asarray(r1.keypoints.x)[ok]
        x2 = np.asarray(r2.keypoints.x)[np.asarray(m.train_idx[0])[ok]]
        dx = x2 - x1
        frac_good = np.mean(np.abs(dx - shift) <= 2.0)
        assert frac_good > 0.6
