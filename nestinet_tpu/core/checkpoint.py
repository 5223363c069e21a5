"""Checkpoint / resume.

The reference saved all graph variables to a single overwritten
`model.ckpt` every 10 epochs and had NO resume path
(`train_n_est_w_experts.py:199, 247-250`).  Here checkpoints carry
(params, state, opt_state, step, epoch) as a msgpack blob plus a JSON
sidecar, written atomically.  Data-stream randomness is NOT stored:
loaders derive their RandomState from (seed, epoch)
(`data/dataset.py::set_epoch`), and the per-step model rng is
fold_in(seed_key, step), so restoring (step, epoch) alone resumes the
exact same streams — pinned by tests/test_train_e2e.py's
resume-determinism test.
"""

from __future__ import annotations

import json
import os
import threading

import jax
import numpy as np
from flax import serialization

CKPT_NAME = "model.msgpack"
META_NAME = "model.meta.json"


def _to_host(tree, *, copy: bool = False):
    """Materialize a pytree on host, starting ALL device->host copies
    first so they stream in parallel — fetching hundreds of parameter
    leaves serially pays a full round trip per leaf on remote devices
    (measured: ~minutes for the 178M-param flagship through a tunnel).

    copy=True forces detached host buffers.  On CPU backends
    np.asarray(jax.Array) can be ZERO-copy, aliasing the device buffer;
    a train step with donate_argnums may then reuse that memory while a
    background checkpoint writer is still serializing it.  Async writers
    must pass copy=True."""
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass
    if copy:
        return jax.tree.map(lambda x: np.array(x, copy=True), tree)
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _template(tree):
    """Restore template: keep ShapeDtypeStructs as-is (pure tree
    structure, nothing to fetch), materialize real arrays on host.
    Passing eval_shape outputs here avoids ever pulling initialized
    parameters off the device just to learn the tree structure."""
    return jax.tree.map(
        lambda x: x if isinstance(x, jax.ShapeDtypeStruct) else np.asarray(x), tree
    )


def save(ckpt_dir: str, *, params, state, opt_state, step: int, epoch: int, keep_history: bool = False) -> str:
    payload = {
        "params": _to_host(params),
        "state": _to_host(state),
        "opt_state": _to_host(opt_state),
    }
    return _write_payload(ckpt_dir, payload, step=step, epoch=epoch,
                          keep_history=keep_history)


class AsyncCheckpointer:
    """Non-blocking checkpoint writes.

    `save()` materializes the trees on host on the caller's thread
    (parallel device->host copies; must finish before the next step may
    donate the buffers) and hands serialization + the atomic file write
    to a background thread, so training overlaps the multi-GB msgpack
    encode/IO.  At most one write is in flight: a new save (or `wait()`
    / process exit) joins the previous one first."""

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def wait(self) -> None:
        """Block until the in-flight write (if any) completes; re-raise
        its error, if it failed."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, ckpt_dir, *, params, state, opt_state, step: int,
             epoch: int, keep_history: bool = False, on_done=None) -> None:
        """`ckpt_dir` may be a single directory or a sequence of them:
        the trees are fetched from device ONCE and the identical payload
        is written to every target (an epoch that is both a periodic and
        a new-best checkpoint would otherwise pay the multi-GB
        device->host fetch and msgpack encode twice)."""
        self.wait()
        dirs = [ckpt_dir] if isinstance(ckpt_dir, str) else list(ckpt_dir)
        # copy=True: the caller's train step donates these buffers; a
        # zero-copy view would let step N+1 overwrite memory the writer
        # thread is still serializing (silent checkpoint corruption on
        # CPU backends).
        host = {
            "params": _to_host(params, copy=True),
            "state": _to_host(state, copy=True),
            "opt_state": _to_host(opt_state, copy=True),
        }

        def _write():
            try:
                for d in dirs:
                    _write_payload(d, host, step=step, epoch=epoch,
                                   keep_history=keep_history)
                if on_done is not None:
                    on_done(epoch)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="ckpt-writer", daemon=True
        )
        self._thread.start()


def _write_payload(ckpt_dir: str, payload: dict, *, step: int, epoch: int,
                   keep_history: bool) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    blob = serialization.to_bytes(payload)
    name = f"model_e{epoch:05d}.msgpack" if keep_history else CKPT_NAME
    path = os.path.join(ckpt_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta = {"step": int(step), "epoch": int(epoch), "file": name}
    tmp = os.path.join(ckpt_dir, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(ckpt_dir, META_NAME))
    return path


def exists(ckpt_dir: str) -> bool:
    return os.path.isfile(os.path.join(ckpt_dir, META_NAME))


def restore(ckpt_dir: str, *, params, state, opt_state):
    """Restore into the given templates (shapes/dtypes must match).

    Templates may be real arrays or `jax.ShapeDtypeStruct` trees (e.g.
    from `jax.eval_shape(model.init, ...)`) — only the tree structure is
    consumed.  Returns (params, state, opt_state, step, epoch).
    """
    with open(os.path.join(ckpt_dir, META_NAME)) as f:
        meta = json.load(f)
    path = os.path.join(ckpt_dir, meta["file"])
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "params": _template(params),
        "state": _template(state),
        "opt_state": _template(opt_state),
    }
    payload = serialization.from_bytes(template, blob)
    return (
        payload["params"],
        payload["state"],
        payload["opt_state"],
        int(meta["step"]),
        int(meta["epoch"]),
    )
