"""Host-side video IO (cv2-based).

Stands in for the reference's libav reader/writer
(/root/reference/src/io/image_sequence_reader.cc, image_sequence_writer.cc)
for the Python CLIs; the native C++ runtime layer owns the libav path.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def read_video_rgb(
    path: str, vertical_flip: bool = False, horizontal_flip: bool = False
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_index, rgb_frame). Flips mirror FlippedImageSequenceSource
    (image_sequence_reader.cc:48-60)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video {path}")
    idx = 0
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if vertical_flip:
            rgb = rgb[::-1]
        if horizontal_flip:
            rgb = rgb[:, ::-1]
        yield idx, np.ascontiguousarray(rgb)
        idx += 1
    cap.release()


def read_image_list_rgb(
    path: str, vertical_flip: bool = False, horizontal_flip: bool = False
) -> Iterator[Tuple[int, int, np.ndarray]]:
    """TUM-style image-list source (the reference's LoadImages,
    /root/reference/src/io/image_sequence_reader.cc:19-46): an index file
    whose first three lines are headers and whose remaining lines are
    ``<timestamp_seconds> <image_path>`` with image paths relative to the
    index file's directory. ``path`` may be the index file itself or a
    directory containing ``rgb.txt`` (the TUM dataset convention).

    Yields (frame_index, time_usec, rgb_frame); flips mirror
    FlippedImageSequenceSource (image_sequence_reader.cc:48-60).
    """
    import os

    import cv2

    if os.path.isdir(path):
        path = os.path.join(path, "rgb.txt")
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        lines = f.read().splitlines()
    idx = 0
    for line in lines[3:]:  # reference skips exactly three header lines
        line = line.strip()
        if not line:
            continue
        parts = line.split()
        if len(parts) < 2:
            raise ValueError(f"malformed image-list line: {line!r}")
        timestamp_sec = float(parts[0])
        bgr = cv2.imread(os.path.join(base, parts[1]), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError(f"cannot read image {parts[1]} from {base}")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if vertical_flip:
            rgb = rgb[::-1]
        if horizontal_flip:
            rgb = rgb[:, ::-1]
        yield idx, int(round(timestamp_sec * 1e6)), np.ascontiguousarray(rgb)
        idx += 1


def is_image_list(path: str) -> bool:
    """True when ``path`` names a TUM-style image list (an index .txt file
    or a directory holding rgb.txt) rather than a video file."""
    import os

    if os.path.isdir(path):
        return os.path.exists(os.path.join(path, "rgb.txt"))
    return path.endswith(".txt")


class VideoWriterRgb:
    """H.264-family mp4 sink, lazy-initialized at the first frame like
    ImageSequenceVideoFileSink (image_sequence_writer.cc:26-87)."""

    def __init__(self, path: str, fps: float = 30.0):
        self._path = path
        self._fps = fps
        self._writer = None

    def consume(self, rgb_frame: np.ndarray) -> None:
        import cv2

        if self._writer is None:
            h, w = rgb_frame.shape[:2]
            self._writer = cv2.VideoWriter(
                self._path, cv2.VideoWriter_fourcc(*"mp4v"), self._fps, (w, h)
            )
            if not self._writer.isOpened():
                raise ValueError(f"cannot open video writer for {self._path}")
        import cv2 as _cv2

        self._writer.write(_cv2.cvtColor(rgb_frame, _cv2.COLOR_RGB2BGR))

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *_):
        self.close()
