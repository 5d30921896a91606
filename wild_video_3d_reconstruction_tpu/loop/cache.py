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
    def __init__(self, quality=95, async_encode=True):
        self.quality = quality
        self.buffer = {}          # slot -> raw image (may still renumber)
        self.saved = {}           # slot -> encoded jpeg bytes
        self.stored = np.zeros(100000, dtype=bool)
        # the reference encodes via an mp.Pool(1) worker
        # (`image_cache.py:15-49`); a single daemon thread gives the same
        # off-hot-path behavior (cv2.imencode releases the GIL)
        self._pool = None
        self._pending = []
        if async_encode:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=1)

    def add_frame(self, image, n):
        self.buffer[n] = image

    def keyframe(self, k):
        tmp = dict(self.buffer)
        self.buffer.clear()
        for n, v in tmp.items():
            if n != k:
                self.buffer[(n - 1) if n > k else n] = v

    def _encode(self, n, img):
        ok, enc = cv2.imencode(
            ".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), self.quality])
        assert ok
        self.saved[n] = enc.tobytes()

    def save_up_to(self, c):
        for n in sorted(list(self.buffer)):
            if n <= c:
                assert not self.stored[n], n
                img = self.buffer.pop(n)
                self.stored[n] = True
                if self._pool is not None:
                    self._pending.append(self._pool.submit(
                        self._encode, n, img))
                else:
                    self._encode(n, img)

    def flush(self):
        for f in self._pending:
            f.result()
        self._pending.clear()

    def load_frames(self, indices):
        """Decode cached frames -> [len(indices), H, W, 3] uint8 (BGR).

        Frames not yet committed by `save_up_to` (possible for the wide
        end of a LOOP_KP_STRIDE>1 triplet) are served raw from the
        deferred buffer."""
        self.flush()
        out = []
        for i in indices:
            if i in self.saved:
                data = np.frombuffer(self.saved[i], np.uint8)
                out.append(cv2.imdecode(data, cv2.IMREAD_COLOR))
            else:
                out.append(np.asarray(self.buffer[i], np.uint8))
        return np.stack(out)

    def close(self):
        self.flush()
        self.buffer.clear()
        self.saved.clear()
