"""Loop-candidate retrieval protocol (backend-agnostic).

Port of the reference's retrieval bookkeeping
(`dpvo/loop_closure/retrieval/retrieval_netvlad.py:33-131`): a descriptor
buffer keyed by keyframe index with renumbering on eviction, deferred
insertion (`save_up_to`), per-query NMS against previously closed loops,
and the consecutive-detection repetition check. The child-process queue of
the reference becomes an optional worker thread (queries are a single
matvec, so the default is synchronous).
"""

from __future__ import annotations

import numpy as np

NMS = 50
SKIP_WINDOW = 50


class BinaryDatabase:
    """DescriptorDatabase-protocol adapter over the native DBoW2-style
    inverted-file retrieval (`native.BinaryRetrieval`, the counterpart of
    the reference's `retrieval_dbow.py:28` backend). Float descriptors are
    LSH-binarized on insert; scores are inverted-file vote counts (not
    cosine), so tune LOOP_RETR_THRESH accordingly when selecting this
    backend."""

    def __init__(self, skip_window=SKIP_WINDOW):
        from ..native import BinaryRetrieval

        self.db = BinaryRetrieval(rad=skip_window)

    def insert_desc(self, n, desc):
        self.db.insert_image(n, np.asarray(desc, np.float32)
                             .reshape(-1, 128))

    def query_online(self, n, skip_window=50, top_k=1):
        j, score, _ = self.db.query(n)
        if j is None:
            return None, None
        return score, j


def make_database(backend, dim, skip_window=SKIP_WINDOW, **kw):
    """Selectable retrieval backend: "vlad" (float dot-product database,
    the NetVLAD-equivalent default) or "dbow" (native binary inverted
    file)."""
    if backend == "dbow":
        return BinaryDatabase(skip_window=skip_window)
    from .netvlad import DescriptorDatabase

    return DescriptorDatabase(dim, **kw)


class Retrieval:
    def __init__(self, database, nms=NMS, skip_window=SKIP_WINDOW):
        self.db = database
        self.nms = nms
        self.skip_window = skip_window
        self.descriptor_buffer = {}
        self.stored = np.zeros(100000, dtype=bool)
        self.pending = []          # query results awaiting consumption
        self.prev_loop_closes = []
        self.found = []

    # ---- frame ingest ----------------------------------------------------
    def add_frame(self, n, desc):
        """Buffer the descriptor for keyframe slot n (may still be evicted)."""
        self.descriptor_buffer[n] = desc

    def keyframe(self, k):
        """Slot k was evicted: renumber buffered (not yet saved) slots."""
        tmp = dict(self.descriptor_buffer)
        self.descriptor_buffer.clear()
        for n, v in tmp.items():
            if n != k:
                self.descriptor_buffer[(n - 1) if n > k else n] = v

    def save_up_to(self, c):
        """Frames <= c can no longer be evicted: commit + query them."""
        for n in sorted(list(self.descriptor_buffer)):
            if n <= c:
                assert not self.stored[n], n
                desc = self.descriptor_buffer.pop(n)
                self.db.insert_desc(n, desc)
                self.stored[n] = True
                score, j = self.db.query_online(n, self.skip_window, top_k=1)
                self.pending.append((n, 0.0 if score is None else score, j))

    # ---- loop detection --------------------------------------------------
    def confirm_loop(self, i, j):
        assert i > j
        self.prev_loop_closes.append((i, j))

    def _repetition_check(self, idx, num_repeat):
        """Require `num_repeat` consecutive-query detections; return the
        middle one (`retrieval_netvlad.py:75-82`, which hard-codes the
        3-window unpack — this generalizes: middle of 3 = index 1)."""
        if len(self.found) < num_repeat:
            return None
        oldest_query = self.found[-num_repeat][0]
        if 1 + idx - oldest_query != num_repeat:
            return None
        i, j = self.found[-num_repeat + num_repeat // 2]
        return (i, max(j, 1))

    def detect_loop(self, thresh, num_repeat=1):
        while self.pending:
            i, score, j = self.pending.pop(0)
            if score < thresh or j is None:
                continue
            assert i > j
            dists = [np.square(i - a) + np.square(j - b)
                     for a, b in self.prev_loop_closes]
            if min(dists, default=np.inf) < self.nms ** 2:
                continue
            self.found.append((i, j))
            cand = self._repetition_check(i, num_repeat)
            if cand is not None:
                return cand
        return None
