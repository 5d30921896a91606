"""Keyframe image cache for loop closure.

The reference writes JPEG-95 files to a TemporaryDirectory via an async
worker pool (`dpvo/loop_closure/retrieval/image_cache.py:15-71`). Here
frames are JPEG-encoded in RAM (~50 KB each, so a 15-minute sequence is a
couple hundred MB) with the same deferred-commit / keyframe-renumbering
protocol.
"""

from __future__ import annotations

import cv2
import numpy as np


class ImageCache:
    def __init__(self, quality=95):
        self.quality = quality
        self.buffer = {}          # slot -> raw image (may still renumber)
        self.saved = {}           # slot -> encoded jpeg bytes
        self.stored = np.zeros(100000, dtype=bool)

    def add_frame(self, image, n):
        self.buffer[n] = image

    def keyframe(self, k):
        tmp = dict(self.buffer)
        self.buffer.clear()
        for n, v in tmp.items():
            if n != k:
                self.buffer[(n - 1) if n > k else n] = v

    def save_up_to(self, c):
        for n in sorted(list(self.buffer)):
            if n <= c:
                assert not self.stored[n], n
                img = self.buffer.pop(n)
                ok, enc = cv2.imencode(
                    ".jpg", img,
                    [int(cv2.IMWRITE_JPEG_QUALITY), self.quality])
                assert ok
                self.saved[n] = enc.tobytes()
                self.stored[n] = True

    def load_frames(self, indices):
        """Decode cached frames -> [len(indices), H, W, 3] uint8 (BGR)."""
        out = []
        for i in indices:
            data = np.frombuffer(self.saved[i], np.uint8)
            out.append(cv2.imdecode(data, cv2.IMREAD_COLOR))
        return np.stack(out)

    def close(self):
        self.buffer.clear()
        self.saved.clear()
