"""Video IO (host-side frame sources).

Reference: CompVVideoReaderFFmpeg (core/video/compv_core_video_reader_ffmpeg.cxx:74-124)
decodes via libavcodec. This environment has no ffmpeg; supported sources:
  * raw .yuv multi-frame files (I420/gray, frame count = size / frame_bytes)
  * directories of image files (sorted)
  * animated GIFs (PIL)
An ffmpeg-backed reader is gated behind binary availability.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator

import numpy as np

from compv_tpu.io.image_io import parse_raw_filename, read_image

__all__ = ["VideoReader", "open_video", "RawYuvReader", "ImageSequenceReader",
           "GifReader", "FfmpegReader", "VideoWriterRaw"]


class VideoReader:
    """Iterator protocol: yields (H, W) gray or (H, W, 3) RGB u8 frames."""

    def __iter__(self) -> Iterator[np.ndarray]:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError


class RawYuvReader(VideoReader):
    def __init__(self, path: str, width: int | None = None,
                 height: int | None = None, gray: bool = True):
        if width is None or height is None:
            width, height = parse_raw_filename(path)
        self.path = path
        self.w, self.h = width, height
        self.gray = gray
        self.frame_bytes = width * height if gray else width * height * 3 // 2
        self.n = os.path.getsize(path) // self.frame_bytes

    def __len__(self):
        return self.n

    def __iter__(self):
        with open(self.path, "rb") as f:
            for _ in range(self.n):
                buf = np.frombuffer(f.read(self.frame_bytes), np.uint8)
                if self.gray:
                    yield buf.reshape(self.h, self.w)
                else:
                    y = buf[: self.w * self.h].reshape(self.h, self.w)
                    yield y  # chroma available via read_raw if needed


class ImageSequenceReader(VideoReader):
    def __init__(self, directory: str, pattern: str = ""):
        names = sorted(os.listdir(directory))
        exts = (".png", ".jpg", ".jpeg", ".bmp", ".pgm", ".ppm")
        self.paths = [os.path.join(directory, n) for n in names
                      if n.lower().endswith(exts) and pattern in n]

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for p in self.paths:
            yield read_image(p)


class GifReader(VideoReader):
    def __init__(self, path: str):
        from PIL import Image
        self.img = Image.open(path)
        self.n = getattr(self.img, "n_frames", 1)

    def __len__(self):
        return self.n

    def __iter__(self):
        from PIL import ImageSequence
        for frame in ImageSequence.Iterator(self.img):
            yield np.asarray(frame.convert("RGB"), np.uint8)


class FfmpegReader(VideoReader):
    """Pipe-decode via the ffmpeg binary when present (the reference's
    decode path analogue). Raises at construction if unavailable."""

    def __init__(self, path: str, width: int, height: int, gray: bool = True):
        if shutil.which("ffmpeg") is None:
            raise RuntimeError("ffmpeg binary not available in this image")
        self.path, self.w, self.h, self.gray = path, width, height, gray

    def __len__(self):
        return -1

    def __iter__(self):
        fmt = "gray" if self.gray else "rgb24"
        bpf = self.w * self.h * (1 if self.gray else 3)
        proc = subprocess.Popen(
            ["ffmpeg", "-i", self.path, "-f", "rawvideo", "-pix_fmt", fmt,
             "-s", f"{self.w}x{self.h}", "-"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
        try:
            while True:
                buf = proc.stdout.read(bpf)
                if len(buf) < bpf:
                    break
                a = np.frombuffer(buf, np.uint8)
                yield a.reshape(self.h, self.w) if self.gray else \
                    a.reshape(self.h, self.w, 3)
        finally:
            proc.terminate()


class VideoWriterRaw:
    """Append-frames raw writer (reference has an ffmpeg writer; raw is the
    dependency-free equivalent)."""

    def __init__(self, path: str):
        self.f = open(path, "wb")

    def write(self, frame: np.ndarray) -> None:
        self.f.write(np.ascontiguousarray(frame).tobytes())

    def close(self) -> None:
        self.f.close()


def open_video(path: str, **kw) -> VideoReader:
    """Factory by extension/type (reference newObj factory pattern)."""
    if os.path.isdir(path):
        return ImageSequenceReader(path)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".yuv":
        return RawYuvReader(path, **kw)
    if ext == ".gif":
        return GifReader(path)
    if ext in (".mp4", ".avi", ".mkv", ".mov", ".webm"):
        return FfmpegReader(path, **kw)
    raise ValueError(f"unsupported video source: {path}")
