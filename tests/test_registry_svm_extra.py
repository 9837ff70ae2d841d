"""Registry factories + SVM CV/multiclass tests."""
import jax.numpy as jnp
import numpy as np

import compv_tpu
from compv_tpu import ml


class TestRegistry:
    def test_create_detector(self, test_image):
        fn, cfg = compv_tpu.create_detector("fast", threshold=30)
        kp = fn(jnp.asarray(test_image), cfg)
        assert int(kp.count()) > 0
        assert cfg.threshold == 30

    def test_create_edge(self, test_image):
        fn, cfg = compv_tpu.create_edge_detector("canny")
        out = np.asarray(fn(jnp.asarray(test_image), cfg))
        assert set(np.unique(out)) <= {0, 255}

    def test_create_matcher(self):
        fn, cfg = compv_tpu.create_matcher("bruteforce")
        rs = np.random.default_rng(0)
        t = rs.integers(0, 2, (10, 256)).astype(np.uint8)
        m = fn(jnp.asarray(t), jnp.asarray(t), cfg)
        np.testing.assert_array_equal(np.asarray(m.train_idx[0]), np.arange(10))

    def test_unknown_raises(self):
        import pytest
        with pytest.raises(KeyError):
            compv_tpu.create_detector("sift")

    def test_list(self):
        algos = compv_tpu.list_algorithms()
        assert "fast" in algos["detectors"]


class TestSvmExtras:
    def test_cross_validation(self):
        rs = np.random.default_rng(1)
        x = np.concatenate([rs.normal(-2, 0.5, (40, 2)),
                            rs.normal(2, 0.5, (40, 2))]).astype(np.float32)
        y = np.concatenate([-np.ones(40), np.ones(40)]).astype(np.float32)
        acc = ml.svm_cross_validate(jnp.asarray(x), jnp.asarray(y),
                                    ml.SvmConfig(gamma=0.5, c=5.0), folds=4)
        assert acc > 0.9

    def test_multiclass(self):
        rs = np.random.default_rng(2)
        centers = np.array([[-3, 0], [3, 0], [0, 3]])
        x = np.concatenate([rs.normal(c, 0.4, (30, 2)) for c in centers]
                           ).astype(np.float32)
        y = np.repeat(np.arange(3), 30).astype(np.float32)
        mc = ml.svm_train_multiclass(jnp.asarray(x), jnp.asarray(y),
                                     ml.SvmConfig(gamma=0.5, c=5.0))
        pred = np.asarray(ml.svm_predict_multiclass(mc, jnp.asarray(x)))
        assert (pred == y).mean() > 0.95
