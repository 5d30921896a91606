"""Host-side frame streaming (the input pipeline).

Equivalent of the reference reader processes (`dpvo/stream.py:10-137`):
globbed image directories or video files, optional undistortion, crop to a
multiple of 16, optional .npy depth (clamped at 10x median) and grayscale
masks. Decode runs off the hot loop in a daemon thread feeding a bounded
queue (cv2 releases the GIL during decode), which double-buffers against
TPU compute — the host->device analogue of the reference's
multiprocessing.Queue pipeline (SURVEY.md section 2.1 TPU mapping).
"""

from __future__ import annotations

import queue
import threading
from itertools import chain
from pathlib import Path

import cv2
import numpy as np

IMG_EXTS = ("*.png", "*.jpeg", "*.jpg")
SENTINEL = (-1, None, None, None, None)


def _globbed(directory, exts, skip, end, stride):
    files = sorted(chain.from_iterable(Path(directory).glob(e) for e in exts))
    return files[skip:end:stride] if end is not None else files[skip::stride]


def list_images(imagedir, stride=1, skip=0, end=None):
    """The image file list a stream over `imagedir` would visit (for
    offline pre-passes such as VLAD vocabulary fitting)."""
    return _globbed(imagedir, IMG_EXTS, skip, end, stride)


def image_frames(imagedir, depthdir=None, maskdir=None, calib=None,
                 stride=1, skip=0, end=None):
    """Yield (t, image BGR u8, depth|None, mask|None, intrinsics[4])."""
    calib = np.loadtxt(calib, delimiter=" ") if isinstance(calib, str) \
        else np.asarray(calib)
    fx, fy, cx, cy = calib[:4]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    images = _globbed(imagedir, IMG_EXTS, skip, end, stride)
    depths = _globbed(depthdir, ("*.npy",), skip, end, stride) \
        if depthdir else None
    masks = _globbed(maskdir, IMG_EXTS, skip, end, stride) if maskdir else None

    for t, imfile in enumerate(images):
        image = cv2.imread(str(imfile), cv2.IMREAD_COLOR)
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        h, w, _ = image.shape
        image = image[:h - h % 16, :w - w % 16]

        depth = None
        if depths:
            depth = np.load(str(depths[t]))[:h - h % 16, :w - w % 16]
            med = np.median(depth[depth > 0])
            depth = np.minimum(depth, 10 * med)
        mask = None
        if masks:
            mask = cv2.imread(str(masks[t]), cv2.IMREAD_GRAYSCALE)
            mask = mask[:h - h % 16, :w - w % 16].astype(bool)
        yield t, image, depth, mask, np.array([fx, fy, cx, cy])


def video_frames(videopath, calib, stride=1, skip=0):
    """Half-resolution video reader (`dpvo/stream.py:94-137`)."""
    calib = np.loadtxt(calib, delimiter=" ") if isinstance(calib, str) \
        else np.asarray(calib)
    fx, fy, cx, cy = calib[:4]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    cap = cv2.VideoCapture(str(videopath))
    for _ in range(skip):
        cap.read()
    t = 0
    while True:
        ret = False
        for _ in range(stride):
            ret, image = cap.read()
            if not ret:
                break
        if not ret:
            break
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        image = cv2.resize(image, None, fx=0.5, fy=0.5,
                           interpolation=cv2.INTER_AREA)
        h, w, _ = image.shape
        image = image[:h - h % 16, :w - w % 16]
        yield t, image, None, None, np.array([fx, fy, cx, cy]) * 0.5
        t += 1
    cap.release()


class Prefetcher:
    """Bounded-queue background reader over any frame generator.

    With device_upload=True the prefetch thread also stages each image on
    the accelerator (`jax.device_put`), overlapping the host->device copy
    (~1.5 ms/frame at 512x384 through the relay tunnel) with the previous
    frame's compute — the DPVO entry accepts device arrays directly.
    """

    def __init__(self, generator, maxsize=8, device_upload=False):
        self._q = queue.Queue(maxsize=maxsize)
        self._upload = device_upload
        self._err = None
        if device_upload:
            # backend discovery must happen on the main thread: plugin
            # backends (axon relay) refuse to initialize from a worker
            # thread, and the resulting fill-thread crash would otherwise
            # look like an empty image directory
            import jax
            jax.devices()
        self._thread = threading.Thread(target=self._fill,
                                        args=(generator,), daemon=True)
        self._thread.start()

    def _fill(self, generator):
        try:
            for item in generator:
                if self._upload and item[1] is not None:
                    import jax
                    t, image, depth, mask, intr = item
                    item = (t, jax.device_put(image), depth, mask, intr)
                self._q.put(item)
        except BaseException as e:              # surfaced by __iter__
            self._err = e
        finally:
            self._q.put(SENTINEL)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item[0] < 0:
                if self._err is not None:
                    raise RuntimeError("prefetch thread failed") \
                        from self._err
                return
            yield item
