"""Native runtime tests (C++ pool + prefetch loader + executor + MD5 via
ctypes)."""
import hashlib

import numpy as np
import pytest

from compv_tpu.native_rt import (
    AlignedPool, Executor, PrefetchLoader, copy_strided, md5_mat,
    native_available,
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


class TestExecutor:
    """Fork-join pool semantics (reference CompVThreadDispatcher11:
    disjoint ranges, blocking join, nested fork runs inline)."""

    def test_covers_range_disjointly(self):
        ex = Executor(4)
        out = np.zeros(10_000, np.int64)

        def fill(b, e):
            out[b:e] += np.arange(b, e)

        ex.parallel_for(fill, 0, 10_000, 16)
        np.testing.assert_array_equal(out, np.arange(10_000))
        ex.close()

    def test_nested_fork_runs_inline(self):
        ex = Executor(2)
        hits = []

        def inner(b, e):
            hits.append((b, e))

        def outer(b, e):
            ex.parallel_for(inner, 0, 4)  # must not deadlock

        ex.parallel_for(outer, 0, 2)
        assert len(hits) >= 2
        ex.close()

    def test_propagates_exception(self):
        ex = Executor(2)

        def boom(b, e):
            raise ValueError("boom")

        with pytest.raises(ValueError):
            ex.parallel_for(boom, 0, 100)
        ex.close()

    def test_empty_range_noop(self):
        ex = Executor(2)
        ex.parallel_for(lambda b, e: 1 / 0, 5, 5)
        ex.close()


class TestMd5:
    """Golden hashing parity with hashlib (reference compv_tests_md5:
    row-wise, stride padding excluded; tests_common.cxx:98-116)."""

    def test_matches_hashlib(self):
        a = np.random.default_rng(3).integers(0, 256, (37, 101)).astype(np.uint8)
        assert md5_mat(a) == hashlib.md5(a.tobytes()).hexdigest()

    def test_strided_skips_padding(self):
        a = np.random.default_rng(4).integers(0, 256, (9, 16)).astype(np.uint8)
        got = md5_mat(a, stride=16, row_bytes=11)
        want = hashlib.md5(
            b"".join(a[r, :11].tobytes() for r in range(9))).hexdigest()
        assert got == want

    def test_block_boundaries(self):
        # exercise every tail length around the 64-byte block size
        for n in (0, 1, 55, 56, 57, 63, 64, 65, 127, 128, 1000):
            a = (np.arange(n) % 251).astype(np.uint8)
            assert md5_mat(a.reshape(1, -1) if n else np.zeros((1, 0), np.uint8)
                           ) == hashlib.md5(a.tobytes()).hexdigest(), n
