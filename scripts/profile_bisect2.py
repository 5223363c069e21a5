"""Bisect 2: manager fc_head layers + vmapped full expert.

From bisect 1: manager BACKBONE 62 ms, expert backbone+head 43 ms,
vmapped expert BACKBONES 138 ms — yet full manager 3.4 s and vmapped
full experts 25.5 s.  The remaining suspects are the manager's fc_head
stack and the vmap x fc_head interaction.  Results append to
/tmp/profile_bisect2.jsonl.
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import haiku as hk
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.models import backbones
from nestinet_tpu.models.base import fc_head
from nestinet_tpu.ops.nn import run_backbone

B = int(os.environ.get("BISECT_BATCH", "256"))
OUT = "/tmp/profile_bisect2.jsonl"


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, *args, repeats=5):
    t0 = time.perf_counter()
    _force(fn(*args))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    for o in outs:
        _force(o)
    total = time.perf_counter() - t0
    return total / repeats * 1e3, warm


def emit(stage, **fields):
    rec = dict(stage=stage, batch=B, **fields)
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def bench_transform(stage, fn, *inputs):
    t = hk.transform_with_state(fn)
    params, state = t.init(jax.random.PRNGKey(0), *inputs)
    app = jax.jit(lambda p, s, *xs: t.apply(p, s, None, *xs)[0])
    ms, warm = timeit(app, params, state, *inputs)
    emit(stage, ms=ms, first_call_s=warm)


def main():
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randn(B, 8, 8, 8, 60).astype(np.float32))

    spec = backbones.CONV_NET_8G

    # manager with head truncated at each depth
    heads = [
        ("bb_fc1", (1024,), None),
        ("bb_fc12", (1024, 256), None),
        ("bb_fc123", (1024, 256, 128), None),
        ("bb_full_relu", (1024, 256, 128), "final"),
        ("bb_full_softmax", (1024, 256, 128), "softmax"),
    ]
    for stage, hidden, mode in heads:
        def fn(x, hidden=hidden, mode=mode):
            feat = run_backbone(x, spec, False, 0.0)
            if mode is None:
                # hidden stack only: DenseBN layers like fc_head's loop
                for i, units in enumerate(hidden):
                    from nestinet_tpu.ops.nn import DenseBN
                    feat = DenseBN(units, bn=True, name=f"fc{i+1}")(feat, False, 0.0)
                return feat
            logits = fc_head(feat, hidden, 7, is_training=False,
                             bn_momentum=0.0, final_activation=jax.nn.relu)
            if mode == "softmax":
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.transpose(probs)
            return logits
        bench_transform(stage, fn, grid)

    # vmapped FULL expert (backbone + fc head), group of 6
    espec = backbones.expert_backbone_8g(128)

    def expert_fn(x):
        feat = run_backbone(x, espec, False, 0.0)
        return fc_head(feat, (512, 128, 64), 3, is_training=False,
                       bn_momentum=0.0)

    t = hk.transform_with_state(expert_fn)
    x20 = grid[..., :20]
    ps, ss = [], []
    for g in range(6):
        p, s = t.init(jax.random.PRNGKey(g), x20)
        ps.append(p)
        ss.append(s)
    sp = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    sstate = jax.tree.map(lambda *xs: jnp.stack(xs), *ss)
    xs = jnp.stack([x20] * 6)

    def vmapped(p, s, x):
        return jax.vmap(lambda pp, s_, xx: t.apply(pp, s_, None, xx)[0])(p, s, x)
    ms, warm = timeit(jax.jit(vmapped), sp, sstate, xs)
    emit("experts6_full_vmap", ms=ms, first_call_s=warm)


if __name__ == "__main__":
    main()
