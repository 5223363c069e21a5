"""Per-component timing of the device-resident serving step on the real chip.

Times, each as its own jitted program (median of several dispatches,
after warmup):
  1. ball query + patch gather (3 radii)
  2. MuPS statistics alone (3 scales)       [pallas and jnp variants]
  3. full model forward from patches (MuPS + manager + experts)
  4. the fused extract->forward program (what serving runs)

Run:  python scripts/profile_serving.py [--batch 256]
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.core.config import Config
from nestinet_tpu.core.profiling import block_sync_reliable, timed
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.ball_query import build_grid, extract_patches, max_cell_occupancy
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import tdmfv_n_est

RADII = (0.01, 0.03, 0.05)
NUM_POINT = 512
N_SHAPE_POINTS = 20_000

# `timed` synchronizes with a one-element host fetch (block_until_ready
# returns early through the axon relay — docs/PERF.md); every figure
# therefore INCLUDES one relay round trip (~24-35 ms on measured days).
# block_sync_reliable() is re-probed at startup so a future backend
# change can't silently flip the numbers to wrong-by-construction.


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--mups_impl", default=None, help="override: jnp|pallas")
    ap.add_argument("--compute_dtype", default="float32",
                    help="CNN compute dtype: float32|bfloat16")
    args = ap.parse_args()
    B = args.batch

    # Warn loudly (and record in the transcript) if blocking-sync timing
    # would have been valid/invalid on this backend; `timed` below uses
    # fetch-sync regardless.
    print(f"block_until_ready reliable: {block_sync_reliable()}")

    rng = np.random.RandomState(0)
    v = rng.randn(N_SHAPE_POINTS, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cloud = (v + 0.002 * rng.randn(N_SHAPE_POINTS, 3)).astype(np.float32)
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
    radii_abs = [r * bbdiag for r in RADII]

    cfg = Config(
        model="experts_n_est", patch_radius=RADII, num_point=NUM_POINT,
        num_gaussians=8, gmm_variance=0.0156, batch_size=B, n_experts=7,
        compute_dtype=args.compute_dtype,
    )
    if args.mups_impl:
        cfg.mups_impl = args.mups_impl
    gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)

    queries = jnp.asarray(cloud[:B])
    cloud_dev = jnp.asarray(cloud)
    grids = [build_grid(cloud_dev, r) for r in radii_abs]
    occ = max(max_cell_occupancy(g) for g in grids)
    cap = 32
    while cap < occ:
        cap *= 2
    print(f"cell capacity: {cap} (occupancy {occ})")

    radii_dev = jnp.asarray(radii_abs, jnp.float32)

    @jax.jit
    def extract_only(grids, queries, radii):
        outs = []
        for i in range(len(RADII)):
            p, ne = extract_patches(grids[i], queries, radii[i], k=NUM_POINT,
                                    cell_capacity=cap, center="point")
            outs.append((p, ne))
        return outs

    t_extract = timed(extract_only, grids, queries, radii_dev)
    print(f"extract (3 radii, ball query + gather): {t_extract:8.1f} ms")

    patches = extract_only(grids, queries, radii_dev)
    pts = jnp.concatenate([p for p, _ in patches], axis=1)
    neff = jnp.stack([ne for _, ne in patches], axis=1)
    batch = {"points": pts, "n_eff": neff}

    w, mu, sigma = (jnp.asarray(x) for x in gmm.astuple())

    @jax.jit
    def mups_jnp_only(pts, neff):
        outs = []
        for s in range(len(RADII)):
            seg = pts[:, s * NUM_POINT:(s + 1) * NUM_POINT]
            outs.append(tdmfv_n_est(seg, w, mu, sigma, neff[:, s], flatten=False))
        return outs

    t_mups_jnp = timed(mups_jnp_only, pts, neff)
    print(f"MuPS jnp (3 scales):                    {t_mups_jnp:8.1f} ms")

    try:
        from nestinet_tpu.ops.pallas.mups_kernel import tdmfv_n_est_pallas

        @jax.jit
        def mups_pallas_only(pts, neff):
            outs = []
            for s in range(len(RADII)):
                seg = pts[:, s * NUM_POINT:(s + 1) * NUM_POINT]
                outs.append(tdmfv_n_est_pallas(seg, w, mu, sigma, neff[:, s]))
            return outs

        t_mups_pl = timed(mups_pallas_only, pts, neff)
        print(f"MuPS pallas (3 scales):                 {t_mups_pl:8.1f} ms")
    except Exception as e:
        print(f"MuPS pallas: unavailable ({type(e).__name__}: {e})")

    rngk = jax.random.PRNGKey(0)
    params, state = model.init_jitted(rngk, batch)

    @jax.jit
    def full_forward(params, state, batch):
        outputs, _ = model.apply(params, state, None, batch, False, 0.0)
        return model.predict_normals(outputs)

    t_fwd = timed(full_forward, params, state, batch)
    print(f"forward from patches (MuPS+mgr+experts):{t_fwd:8.1f} ms")

    @jax.jit
    def manager_only(params, state, batch):
        return model.apply_manager(params, state, batch)

    t_mgr = timed(manager_only, params, state, batch)
    print(f"MuPS + manager only:                    {t_mgr:8.1f} ms")

    @jax.jit
    def fused(params, state, grids, queries, radii):
        outs = []
        for i in range(len(RADII)):
            p, ne = extract_patches(grids[i], queries, radii[i], k=NUM_POINT,
                                    cell_capacity=cap, center="point")
            outs.append((p, ne))
        b = {
            "points": jnp.concatenate([p for p, _ in outs], axis=1),
            "n_eff": jnp.stack([ne for _, ne in outs], axis=1),
        }
        outputs, _ = model.apply(params, state, None, b, False, 0.0)
        return model.predict_normals(outputs)

    t_fused = timed(fused, params, state, grids, queries, radii_dev)
    print(f"fused extract->forward (serving step):  {t_fused:8.1f} ms")
    print(f"=> {B / (t_fused / 1e3):.0f} patches/s at batch {B} "
          f"(compute only, no host loop)")


if __name__ == "__main__":
    main()
