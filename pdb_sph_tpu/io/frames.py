"""Frame output: device -> host position streaming + background PNG writing.

Replaces the reference's render loop (C13-C16 in SURVEY.md): instead of a
CUDA-mapped VBO drawn by OpenGL every frame, positions are pulled from the
TPU only when a frame is due and rasterized + encoded off the critical path
by a worker thread, so simulation throughput is unaffected by IO.

PNG encoding is dependency-free (zlib + struct from the stdlib).
"""

from __future__ import annotations

import os
import queue
import struct
import threading
import zlib

import numpy as np

from ..render import renderer


def write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal RGB8 PNG encoder (stdlib only)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


class FrameWriter:
    """Asynchronous rasterize-and-write sink.

    submit() copies positions to host memory and returns immediately; a
    worker thread renders and encodes. close() drains the queue.
    """

    def __init__(self, out_dir: str, width: int = 1280, height: int = 720,
                 max_pending: int = 4, **render_kwargs):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.width, self.height = width, height
        self.render_kwargs = render_kwargs
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._err: BaseException | None = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.frames_written = 0

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            step, pos = item
            try:
                rgb = renderer.render(pos, self.width, self.height,
                                      **self.render_kwargs)
                write_png(os.path.join(self.out_dir, f"frame_{step:06d}.png"), rgb)
                self.frames_written += 1
            except BaseException as e:  # surfaced on close()
                self._err = e

    def submit(self, step: int, positions) -> None:
        if self._err:
            raise RuntimeError("frame writer failed") from self._err
        self._q.put((int(step), np.asarray(positions)))

    def close(self) -> None:
        self._q.put(None)
        self._worker.join()
        if self._err:
            raise RuntimeError("frame writer failed") from self._err

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
