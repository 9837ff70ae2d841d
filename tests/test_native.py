"""Native runtime tests (C++ pool + prefetch loader via ctypes)."""
import numpy as np
import pytest

from compv_tpu.native_rt import (
    AlignedPool, PrefetchLoader, copy_strided, native_available,
)


def test_native_builds():
    assert native_available(), "native library must compile in this image"


class TestPool:
    def test_alloc_release_reuse(self):
        pool = AlignedPool(64)
        a = pool.alloc(1 << 20)
        a[:] = 7
        pool.release(a)
        b = pool.alloc(1 << 20)
        s = pool.stats()
        assert s["hits"] >= 1  # second alloc reused the block
        pool.close()

    def test_alignment(self):
        pool = AlignedPool(256)
        a = pool.alloc(4096)
        assert a.ctypes.data % 256 == 0
        pool.close()


class TestLoader:
    def test_reads_frames_in_order(self, tmp_path):
        h, w, n = 24, 32, 6
        frames = np.stack([np.full((h, w), i * 10, np.uint8) for i in range(n)])
        p = str(tmp_path / "seq.raw")
        frames.tofile(p)
        loader = PrefetchLoader(p, h, w)
        assert len(loader) == n
        got = list(loader)
        assert len(got) == n
        for i, f in enumerate(got):
            assert (f == i * 10).all()
        loader.close()

    def test_loop_mode(self, tmp_path):
        h, w = 8, 8
        frames = np.stack([np.full((h, w), i, np.uint8) for i in range(3)])
        p = str(tmp_path / "seq.raw")
        frames.tofile(p)
        loader = PrefetchLoader(p, h, w, loop=True)
        vals = [int(loader.next()[0, 0]) for _ in range(7)]
        assert vals == [0, 1, 2, 0, 1, 2, 0]
        loader.close()

    def test_eos(self, tmp_path):
        h, w = 8, 8
        np.zeros((2, h, w), np.uint8).tofile(str(tmp_path / "s.raw"))
        loader = PrefetchLoader(str(tmp_path / "s.raw"), h, w)
        assert loader.next() is not None
        assert loader.next() is not None
        assert loader.next() is None
        loader.close()


def test_copy_strided():
    src = np.arange(100, dtype=np.uint8)
    dst = np.zeros(80, np.uint8)
    copy_strided(src, 10, dst, 8, 8, 10)
    want = np.concatenate([src[i * 10: i * 10 + 8] for i in range(10)])
    np.testing.assert_array_equal(dst, want)
