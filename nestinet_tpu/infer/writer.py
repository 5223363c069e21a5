"""Shape-scatter results writer.

Streaming inference sees one flat stream of patches (all points of all
shapes, in order); this writer scatters per-batch outputs back into
per-shape buffers and flushes `<shape>.normals` (and for the MoE model
`.experts` / `.experts_probs`) when a shape completes — parity with the
scatter loop in `test_n_est_w_experts.py:120-197`.
"""

from __future__ import annotations

import os

import numpy as np

from ..core import textio


class ShapeScatterWriter:
    def __init__(self, output_dir: str, shape_names, shape_patch_counts,
                 n_experts: int | None = None):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.shape_names = list(shape_names)
        self.counts = list(shape_patch_counts)
        self.n_experts = n_experts
        self.shape_ind = 0
        self.offset = 0
        self.written: list[str] = []
        self._alloc()

    def _alloc(self):
        if self.shape_ind >= len(self.shape_names):
            return
        count = self.counts[self.shape_ind]
        self.normals = np.zeros((count, 3), dtype=np.float64)
        if self.n_experts is not None:
            self.experts = np.zeros((count,), dtype=np.int64)
            self.expert_probs = np.zeros((count, self.n_experts), dtype=np.float64)

    def append(self, normals, experts=None, expert_probs=None):
        """Append a batch of per-patch outputs (already trimmed of any
        padding rows)."""
        normals = np.asarray(normals)
        batch_offset = 0
        while batch_offset < normals.shape[0] and self.shape_ind < len(self.shape_names):
            remaining_shape = self.counts[self.shape_ind] - self.offset
            remaining_batch = normals.shape[0] - batch_offset
            take = min(remaining_shape, remaining_batch)

            dst = slice(self.offset, self.offset + take)
            src = slice(batch_offset, batch_offset + take)
            self.normals[dst] = normals[src]
            if self.n_experts is not None:
                self.experts[dst] = np.asarray(experts)[src]
                self.expert_probs[dst] = np.asarray(expert_probs)[src]

            self.offset += take
            batch_offset += take

            if self.offset == self.counts[self.shape_ind]:
                self._flush()

    def _flush(self):
        # textio.savetxt: byte-identical np.savetxt replacement with C
        # formatting — on this 1-core host the formatting runs on the
        # async writer thread but its GIL time still comes out of the
        # serving loop (~35 ms/1024 patches with np.savetxt, ~10x less
        # native; docs/PERF.md round-5 host-tail section).
        name = self.shape_names[self.shape_ind]
        textio.savetxt(
            os.path.join(self.output_dir, name + ".normals"), self.normals
        )
        if self.n_experts is not None:
            textio.savetxt(
                os.path.join(self.output_dir, name + ".experts"),
                self.experts,
                fmt="%i",
            )
            textio.savetxt(
                os.path.join(self.output_dir, name + ".experts_probs"),
                self.expert_probs,
            )
        self.written.append(name)
        self.shape_ind += 1
        self.offset = 0
        self._alloc()

    @property
    def done(self) -> bool:
        return self.shape_ind >= len(self.shape_names)


class AsyncShapeWriter:
    """Threaded front-end for ShapeScatterWriter.

    The serving loops spend most of each step blocked in device->host
    fetches (GIL released), while result formatting — np.stack over the
    emit chunks, the scatter copy, and np.savetxt on shape completion —
    is pure host work measured at ~19 µs/patch on this 1-core host
    (~10% of device-sparse wall time at B=1024).  Routing appends
    through a single worker thread moves that work into the fetch
    windows; one bounded queue preserves order, and worker exceptions
    re-raise on the next append() or at close() (same error-surfacing
    contract as the checkpoint writer).

    The wrapped writer must only be touched by the worker after
    construction; callers read `writer.done` / `writer.written` after
    `close()` returns.
    """

    def __init__(self, writer: ShapeScatterWriter, maxsize: int = 64):
        import queue
        import threading

        self.writer = writer
        self._q = queue.Queue(maxsize=maxsize)
        self._err: BaseException | None = None
        self._thread = threading.Thread(
            target=self._loop, name="shape-writer", daemon=True
        )
        self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is not None:
                continue  # keep draining so a full queue can't block put()
            try:
                fn, args = item
                fn(*args)
            except BaseException as e:  # surfaced on append()/close()
                self._err = e

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async shape writer failed") from err

    def append(self, *arrays):
        self._check()
        self._q.put((self.writer.append, arrays))

    def close(self):
        """Drain the queue, stop the worker, re-raise any worker error."""
        self._q.put(None)
        self._thread.join()
        self._check()
