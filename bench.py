"""Benchmark: flagship MoE inference throughput (PCPNet protocol shapes).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}

value        end-to-end streaming inference rate (query points/sec/chip)
             over a synthetic PCPNet-style shape: host kd-tree patch
             extraction (threaded, prefetched) overlapped with the jitted
             MuPS + manager + 7-expert forward pass on the TPU.
vs_baseline  value / reference-proxy rate.  The reference publishes no
             numbers (BASELINE.md); its end-to-end rate is upper-bounded
             by its single-threaded patch-extraction loop (workers=0,
             provider.py:425) since the TF1 session ran strictly after it
             each step.  We measure exactly that loop (same kd-tree
             queries, same radii) on this machine and use it as the
             denominator, so vs_baseline is a LOWER bound on the true
             end-to-end speedup.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nestinet_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from nestinet_tpu.core.config import Config  # noqa: E402
from nestinet_tpu.core.rundir import RunDir  # noqa: E402
from nestinet_tpu.data.dataset import PatchDataset  # noqa: E402
from nestinet_tpu.infer.predict import predict_shapes  # noqa: E402
from nestinet_tpu.models import build_model  # noqa: E402
from nestinet_tpu.ops.gmm import get_3d_grid_gmm  # noqa: E402
from nestinet_tpu.train.train_step import make_optimizer  # noqa: E402

BATCH = 128
NUM_POINT = 512
RADII = (0.01, 0.03, 0.05)
N_SHAPE_POINTS = 20_000
REF_PROBE_PATCHES = 512


def make_shape(root, n_points, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n_points, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v + 0.002 * rng.randn(n_points, 3)
    np.savetxt(os.path.join(root, "bench_sphere.xyz"), pts)
    np.savetxt(os.path.join(root, "bench_sphere.normals"), v)
    with open(os.path.join(root, "benchset.txt"), "w") as f:
        f.write("bench_sphere\n")


def reference_proxy_rate(root) -> float:
    """Single-threaded patch extraction rate (patches/sec) — the
    reference pipeline's upper bound."""
    ds = PatchDataset(
        root=root,
        shape_list_filename="benchset.txt",
        patch_radius=list(RADII),
        points_per_patch=NUM_POINT,
        features=(),
        seed=3627473,
        use_native=False,  # the reference proxy is the scipy/numpy path
    )
    _ = ds[0]  # warm the shape cache / kd-tree
    t0 = time.perf_counter()
    for i in range(REF_PROBE_PATCHES):
        _ = ds[i % len(ds)]
    dt = time.perf_counter() - t0
    return REF_PROBE_PATCHES / dt


def build_run(root) -> str:
    """Create a run dir with randomly-initialized flagship weights."""
    cfg = Config(
        model="experts_n_est",
        log_dir=os.path.join(root, "run"),
        data_path=root,
        patch_radius=RADII,
        num_point=NUM_POINT,
        num_gaussians=8,
        gmm_variance=0.0156,
        batch_size=BATCH,
        n_experts=7,
    )
    rd = RunDir.create(cfg.log_dir)
    cfg.save(rd.config_path)
    gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
    gmm.save(rd.gmm_path)
    model = build_model(cfg, gmm)
    rng = np.random.RandomState(1)
    batch = {
        "points": jnp.asarray(
            rng.uniform(-1, 1, size=(BATCH, len(RADII) * NUM_POINT, 3)), jnp.float32
        ),
        "n_eff": jnp.full((BATCH, len(RADII)), NUM_POINT, jnp.int32),
    }
    params, state = model.init_jitted(jax.random.PRNGKey(0), batch)
    opt_state = make_optimizer(cfg).init(params)
    ckpt_lib.save(
        rd.ckpt_dir, params=params, state=state, opt_state=opt_state, step=0, epoch=0
    )
    return rd.path


def main():
    t0 = time.perf_counter()

    def mark(msg):  # progress to stderr; stdout stays one JSON line
        print(f"[bench {time.perf_counter() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    with tempfile.TemporaryDirectory() as root:
        make_shape(root, N_SHAPE_POINTS)
        ref_rate = reference_proxy_rate(root)
        mark(f"reference proxy: {ref_rate:.1f} patches/s")

        run_path = build_run(root)
        mark("run dir built (jitted init + checkpoint)")
        # warmup pass: compile + caches
        predict_shapes(
            run_path,
            dataset_name="warmup",
            testset="benchset.txt",
            data_path=root,
            batch_size=BATCH,
            loader_workers=8,
        )
        mark("warmup inference done (forward compiled)")
        stats = predict_shapes(
            run_path,
            dataset_name="bench",
            testset="benchset.txt",
            data_path=root,
            batch_size=BATCH,
            loader_workers=8,
        )
        mark(f"bench inference done: {stats['patches_per_sec']:.1f} patches/s")
        ours = stats["patches_per_sec"]

    print(
        json.dumps(
            {
                "metric": "pcpnet_moe_inference_points_per_sec_per_chip",
                "value": round(ours, 2),
                "unit": "points/s",
                "vs_baseline": round(ours / ref_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
