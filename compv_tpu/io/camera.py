"""Camera capture abstraction.

Reference: CompVCamera (camera/include/compv/camera/compv_camera.h:61-87):
devices() / start(deviceId) / stop() / OnNewFrame callback delivering a
frame, with per-OS plugin backends (DirectShow / MediaFoundation /
Android NDK, SURVEY.md §2.5).

This environment has no camera hardware; the same API is provided with two
backends: a file/video-backed camera (replays any VideoReader at a target
fps) and a synthetic pattern camera (moving checkerboard for demos/tests).
The capture loop runs on a daemon thread and delivers frames through the
callback exactly like the reference's capture plugins do.
"""
from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import numpy as np

from compv_tpu.io.video import VideoReader, open_video

__all__ = ["Camera", "VideoFileCamera", "SyntheticCamera", "list_devices"]

FrameCallback = Callable[[np.ndarray], None]


def list_devices():
    """Reference CompVCamera::devices(). No hardware backends in this
    environment: returns the virtual devices."""
    return ["synthetic:checkerboard", "file:<path>"]


class Camera:
    """start()/stop() + OnNewFrame callback lifecycle."""

    def __init__(self):
        self._cb: Optional[FrameCallback] = None
        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()
        self.finished = threading.Event()   # set when the capture loop
                                            # exits (exhaustion or stop) —
                                            # run_live waits on it

    def set_callback(self, cb: FrameCallback) -> None:
        self._cb = cb

    def start(self) -> None:
        if self._thread is not None:
            return
        self._running.set()
        self.finished.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def _run(self):
        try:
            self._loop()
        finally:
            self.finished.set()

    def _loop(self):
        raise NotImplementedError


class VideoFileCamera(Camera):
    def __init__(self, path: str, fps: float = 30.0, loop: bool = True, **kw):
        super().__init__()
        self.reader: VideoReader = open_video(path, **kw)
        self.fps = fps
        self.loop = loop

    def _loop(self):
        period = 1.0 / self.fps
        while self._running.is_set():
            for frame in self.reader:
                if not self._running.is_set():
                    return
                t0 = time.perf_counter()
                if self._cb is not None:
                    self._cb(frame)
                dt = time.perf_counter() - t0
                if dt < period:
                    time.sleep(period - dt)
            if not self.loop:
                return


class SyntheticCamera(Camera):
    """Moving checkerboard + gradient scene, deterministic."""

    def __init__(self, width: int = 640, height: int = 480, fps: float = 30.0,
                 n_frames: int | None = None):
        super().__init__()
        self.w, self.h, self.fps = width, height, fps
        self.n_frames = n_frames

    def frame_at(self, t: int) -> np.ndarray:
        yy, xx = np.mgrid[0:self.h, 0:self.w]
        shift = (t * 3) % 64
        ch = (((xx + shift) // 32) + (yy // 32)) % 2
        base = 40 + 150 * ch + (xx * 30 // self.w)
        return np.clip(base, 0, 255).astype(np.uint8)

    def _loop(self):
        period = 1.0 / self.fps
        t = 0
        while self._running.is_set():
            if self.n_frames is not None and t >= self.n_frames:
                return
            if self._cb is not None:
                self._cb(self.frame_at(t))
            t += 1
            time.sleep(period)
