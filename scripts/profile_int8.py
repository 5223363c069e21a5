"""Probe + profile the int8 serving kernels on the real TPU chip.

Run AFTER any training job frees the chip (one host core; HBM is
nearly full during flagship training):

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python scripts/profile_int8.py [--batch 256]

Stages:
  1. int8 support probe: one s8xs8->s32 conv + dot through the axon
     backend (fails loudly if the relay/compiler rejects int8);
  2. manager CNN forward at float32 / bfloat16 / int8 on the flagship
     configuration (B x 8^3 x 60ch grid), timed by synchronizing fetch
     (block_until_ready does NOT synchronize on axon — docs/PERF.md);
  3. one expert-group forward, same dtypes.

Prints per-stage ms/batch; the empty-program dispatch time is measured
first and reported so true compute can be read by subtraction.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm


def sync_time(fn, args, *, reps=8):
    """Median wall ms per call, synchronized by fetching one output
    element to the host (the only true sync on the axon relay)."""
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # warm + sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def probe_int8(dev):
    x = jax.device_put(
        jnp.asarray(np.random.randint(-127, 127, (8, 8, 8, 8, 32)), jnp.int8), dev
    )
    w = jax.device_put(
        jnp.asarray(np.random.randint(-127, 127, (5, 5, 5, 32, 64)), jnp.int8), dev
    )

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )

    out = np.asarray(conv(x, w))
    # exactness vs f32 on small magnitudes
    want = np.asarray(
        jax.jit(
            lambda x, w: jax.lax.conv_general_dilated(
                x.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        )(x, w)
    )
    err = np.abs(out.astype(np.float64) - want.astype(np.float64)).max()
    print(f"int8 conv probe: ok, dtype={out.dtype}, max|int8-f32|={err}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev)
    probe_int8(dev)

    B = args.batch
    rng = np.random.RandomState(0)
    results = {}
    for dtype in ("float32", "bfloat16", "int8"):
        cfg = Config(
            model="experts_n_est", patch_radius=(0.01, 0.03, 0.05),
            num_point=512, num_gaussians=8, gmm_variance=0.0156,
            batch_size=B, n_experts=7, compute_dtype=dtype,
        )
        gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
        model = build_model(cfg, gmm)
        grid_np = rng.randn(B, 8, 8, 8, 60).astype(np.float32)
        grid = jax.device_put(
            jnp.asarray(grid_np, model.compute_dtype), dev
        )
        batch = {
            "points": jnp.asarray(
                rng.uniform(-1, 1, (4, 3 * 512, 3)), jnp.float32
            ),
            "n_eff": jnp.full((4, 3), 512, jnp.int32),
        }
        with jax.default_device(jax.devices("cpu")[0] if jax.devices("cpu") else dev):
            params, state = model.init_jitted(jax.random.PRNGKey(0), batch)
        params = jax.device_put(params, dev)
        state = jax.device_put(state, dev)

        man = jax.jit(model.apply_manager_on_grid)
        t_man = sync_time(man, (params, state, grid))
        # one expert group's member-0 forward on the grid
        exp = jax.jit(
            lambda p, s, g: model.apply_expert_member_on_grid(
                p, s, g, 0, jnp.asarray(0, jnp.int32)
            )
        )
        t_exp = sync_time(exp, (params, state, grid))
        results[dtype] = (t_man, t_exp)
        print(f"{dtype:>9}: manager {t_man:7.1f} ms  expert {t_exp:7.1f} ms")

    @jax.jit
    def empty(x):
        return x

    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), dev)
    t0 = sync_time(empty, (tiny,))
    print(f"dispatch floor: {t0:.1f} ms (subtract for true compute)")


if __name__ == "__main__":
    main()
