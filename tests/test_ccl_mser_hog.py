"""CCL, MSER, HOG tests with scipy oracles where applicable."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from compv_tpu.features.ccl import CclConfig, ccl_features, label_components
from compv_tpu.features.hog import HogConfig, gradient_fast, hog_descriptor
from compv_tpu.features.mser import MserConfig, mser_detect


@pytest.fixture(scope="module")
def blob_img():
    img = np.zeros((64, 96), np.uint8)
    img[5:15, 5:20] = 255          # blob A: 10x15
    img[30:50, 40:60] = 255        # blob B: 20x20
    img[60:63, 90:95] = 255        # blob C: 3x5
    img[20, 70] = 255              # single pixel
    return img


class TestCcl:
    def test_component_count_matches_scipy(self, blob_img):
        res = ccl_features(jnp.asarray(blob_img), CclConfig(max_components=16))
        lbl_scipy, n_scipy = ndimage.label(blob_img > 0,
                                           structure=np.ones((3, 3)))
        assert int(res.num_components) == n_scipy

    def test_labels_partition_match(self, blob_img):
        lbl = np.asarray(label_components(jnp.asarray(blob_img)))
        want, _ = ndimage.label(blob_img > 0, structure=np.ones((3, 3)))
        # same partition: bijection between label sets on foreground
        fg = blob_img > 0
        pairs = set(zip(lbl[fg].tolist(), want[fg].tolist()))
        assert len(pairs) == len(set(p[0] for p in pairs))
        assert len(pairs) == len(set(p[1] for p in pairs))
        assert (lbl[~fg] == -1).all()

    def test_areas_and_boxes(self, blob_img):
        res = ccl_features(jnp.asarray(blob_img), CclConfig(max_components=16))
        areas = sorted(np.asarray(res.area)[np.asarray(res.valid)].tolist(),
                       reverse=True)
        assert areas == [400, 150, 15, 1]
        # biggest blob (B) bbox
        i = int(np.argmax(np.asarray(res.area)))
        assert (int(res.box_x0[i]), int(res.box_y0[i]),
                int(res.box_x1[i]), int(res.box_y1[i])) == (40, 30, 59, 49)
        np.testing.assert_allclose(
            [float(res.cx[i]), float(res.cy[i])], [49.5, 39.5], atol=1e-4)

    def test_4_connectivity(self):
        img = np.zeros((8, 8), np.uint8)
        img[1, 1] = img[2, 2] = 255  # diagonal touch
        res8 = ccl_features(jnp.asarray(img), CclConfig(connectivity=8,
                                                        max_components=8))
        res4 = ccl_features(jnp.asarray(img), CclConfig(connectivity=4,
                                                        max_components=8))
        assert int(res8.num_components) == 1
        assert int(res4.num_components) == 2

    def test_spiral_convergence(self):
        """Long snake component — worst case for plain propagation; pointer
        jumping must still converge within the iteration cap."""
        img = np.zeros((40, 40), np.uint8)
        # boustrophedon snake
        for r in range(0, 40, 4):
            img[r, :] = 255
            if r + 4 < 40:
                img[r:r + 4, 39 if (r // 4) % 2 == 0 else 0] = 255
        res = ccl_features(jnp.asarray(img), CclConfig(max_components=8))
        assert int(res.num_components) == 1


class TestMser:
    def test_dark_blobs_found(self):
        img = np.full((80, 120), 220, np.uint8)
        img[10:30, 10:40] = 40     # dark blob 1
        img[50:70, 70:110] = 60    # dark blob 2
        res = mser_detect(jnp.asarray(img), MserConfig(max_regions=32))
        v = np.asarray(res.valid)
        assert v.sum() >= 2
        boxes = np.stack([np.asarray(res.box_x0)[v], np.asarray(res.box_y0)[v],
                          np.asarray(res.box_x1)[v], np.asarray(res.box_y1)[v]], 1)
        # both blobs present as (near-exact) boxes
        def has_box(x0, y0, x1, y1):
            return any(abs(b[0]-x0) <= 1 and abs(b[1]-y0) <= 1
                       and abs(b[2]-x1) <= 1 and abs(b[3]-y1) <= 1 for b in boxes)
        assert has_box(10, 10, 39, 29)
        assert has_box(70, 50, 109, 69)

    def test_bright_mode(self):
        img = np.full((60, 60), 30, np.uint8)
        img[20:40, 20:40] = 230
        res_d = mser_detect(jnp.asarray(img), MserConfig(dark=True, max_regions=16))
        res_b = mser_detect(jnp.asarray(img), MserConfig(dark=False, max_regions=16))
        vb = np.asarray(res_b.valid)
        assert vb.sum() >= 1
        i = np.nonzero(vb)[0][0]
        assert abs(int(res_b.box_x0[i]) - 20) <= 1

    def test_area_filters(self):
        img = np.full((64, 64), 200, np.uint8)
        img[30, 30] = 10            # tiny region — below min_area
        res = mser_detect(jnp.asarray(img), MserConfig(min_area=0.01))
        v = np.asarray(res.valid)
        areas = np.asarray(res.area)[v]
        assert (areas >= 0.01 * 64 * 64).all() if v.any() else True


class TestHog:
    def test_shape(self):
        rs = np.random.default_rng(0)
        img = rs.integers(0, 255, (128, 64), dtype=np.uint8)
        d = hog_descriptor(jnp.asarray(img))
        # 16x8 cells, 2x2 blocks stride 1 -> 15x7 blocks x 36
        assert d.shape == (15, 7, 36)

    def test_norm_bounded(self):
        rs = np.random.default_rng(1)
        img = rs.integers(0, 255, (64, 64), dtype=np.uint8)
        d = np.asarray(hog_descriptor(jnp.asarray(img)))
        norms = np.linalg.norm(d, axis=-1)
        assert np.all(norms < 1.01)
        assert np.all(d >= 0)

    def test_vertical_edge_bin(self):
        """Vertical edge -> horizontal gradient -> angle 0 -> first bin
        dominates (unsigned, bilinear splits across wrap)."""
        img = np.zeros((32, 32), np.uint8)
        img[:, 16:] = 255
        d = np.asarray(hog_descriptor(jnp.asarray(img), HogConfig(norm="none")))
        hist = d.reshape(-1, 9).sum(0)
        assert hist.argmax() == 0 or hist.argmax() == 8  # wrap-adjacent

    def test_gradient_fast_matches_numpy(self):
        rs = np.random.default_rng(2)
        img = rs.integers(0, 255, (16, 16), dtype=np.uint8)
        gx, gy = gradient_fast(jnp.asarray(img))
        f = img.astype(np.float32)
        want_gx = (np.pad(f, ((0, 0), (1, 1)), mode="edge")[:, 2:]
                   - np.pad(f, ((0, 0), (1, 1)), mode="edge")[:, :-2]) * 0.5
        np.testing.assert_allclose(np.asarray(gx), want_gx, atol=1e-5)

    def test_rotation_shifts_bins(self):
        """45deg gratings put energy in a different bin than 0deg."""
        yy, xx = np.mgrid[0:64, 0:64]
        v = (np.sin(xx * 0.8) * 127 + 128).astype(np.uint8)
        d_v = np.asarray(hog_descriptor(jnp.asarray(v), HogConfig(norm="none"))
                         ).reshape(-1, 9).sum(0)
        diag = (np.sin((xx + yy) * 0.6) * 127 + 128).astype(np.uint8)
        d_d = np.asarray(hog_descriptor(jnp.asarray(diag), HogConfig(norm="none"))
                         ).reshape(-1, 9).sum(0)
        assert d_v.argmax() != d_d.argmax()
