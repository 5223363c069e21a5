"""Benchmark: flagship MoE inference throughput (PCPNet protocol shapes).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}

value        end-to-end streaming inference rate (query points/sec/chip)
             of the fastest parity-pinned serving mode — since round 3
             that is fully device-resident extraction (grid-hash ball
             query + MuPS + manager fused into program A) with sparse
             argmax-expert routing (program B) at int8, B=1024; outputs
             identical to the reference-faithful dense path.

vs_baseline  value / reference-style rate ON THE SAME CHIP.  The
             reference publishes no numbers (BASELINE.md), and its
             TF1/CUDA9 stack cannot run here, so the denominator is the
             reference's *execution design* measured on identical
             silicon: single-threaded patch extraction (workers=0,
             `provider.py:425`) feeding a dense all-experts forward
             (`test_n_est_w_experts.py:148-152`) with a synchronous
             fetch per step — i.e. what porting the reference 1:1 to
             this TPU would deliver.  vs_baseline therefore isolates
             the framework-design speedup (sparse MoE routing, fused
             Pallas MuPS, pipelined host/device overlap) with the
             hardware held constant; the hardware delta vs the
             reference's 2018 single GPU comes on top of it.
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

# Each dispatch through the remote-TPU (axon) relay has a ~24 ms
# latency floor and results trickle back at ~1.5 MB/s, so throughput is
# won by amortizing dispatches: at 256 the manager covers 2x the
# patches of 128 for ~1.6x the step time and every expert-bucket flush
# covers 256 patches.
BATCH = 256
NUM_POINT = 512
RADII = (0.01, 0.03, 0.05)
N_SHAPE_POINTS = 20_000
REF_PROBE_PATCHES = 512


def make_shape(root, n_points, seed=0):
    """Two shapes (sphere + torus): single-shape 20k-patch passes were
    noise-dominated through the relay (repeat spread >30%).  Geometry
    comes from the unit-tested generators in data/synthetic.py (one
    torus implementation in the repo, not two)."""
    from nestinet_tpu.data import synthetic as syn

    rng = np.random.RandomState(seed)
    for name, gen in (("bench_sphere", syn.sphere), ("bench_torus", syn.torus)):
        pts, nrm = gen(n_points, rng)
        np.savetxt(os.path.join(root, name + ".xyz"),
                   pts + 0.002 * rng.randn(n_points, 3))
        np.savetxt(os.path.join(root, name + ".normals"), nrm)
    with open(os.path.join(root, "benchset.txt"), "w") as f:
        f.write("bench_sphere\nbench_torus\n")


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


BENCH_CACHE = "/root/repo/.bench_cache"
TRAINED_RUN_ENV = "NESTINET_BENCH_RUN"
TRAINED_RUN_DEFAULTS = (
    "/root/repo/log/moe_synth60",  # 60-epoch run with best-val checkpoint
    "/root/repo/log/moe_synth",
)


def _find_trained_run() -> str | None:
    """A TRAINED flagship checkpoint, if one matches the bench protocol.

    BASELINE.json defines the metric as points/sec *at RMS parity*, so
    the bench prefers real trained weights (quality pinned in
    QUALITY.md) over random init whenever a compatible run exists —
    $NESTINET_BENCH_RUN first, then the default quality-training run
    dir (checking numbered collision subdirs, newest first).
    """
    cands = []
    env = os.environ.get(TRAINED_RUN_ENV)
    if env:
        cands.append(env)
    for base in TRAINED_RUN_DEFAULTS:
        if os.path.isdir(base):
            subs = sorted(
                (d for d in os.listdir(base) if d.isdigit()), key=int,
                reverse=True,
            )
            cands.extend(os.path.join(base, d) for d in subs)
            cands.append(base)
    for cand in cands:
        if not os.path.exists(os.path.join(cand, "ckpt", "model.msgpack")):
            continue
        try:
            with open(os.path.join(cand, "config.json")) as f:
                c = json.load(f)
        except OSError:
            continue
        if (
            c.get("model") == "experts_n_est"
            and tuple(c.get("patch_radius", ())) == RADII
            and c.get("num_point") == NUM_POINT
            and c.get("num_gaussians") == 8
        ):
            return cand
    return None


def build_run(root) -> str:
    """Return the run dir to benchmark: a trained flagship run when one
    matches the protocol (see _find_trained_run), else a cached
    randomly-initialized run.  Serializing the 178M-param checkpoint
    costs minutes, so the random-init run dir is cached under
    BENCH_CACHE keyed by the bench config; delete it to force a
    rebuild."""
    trained = _find_trained_run()
    if trained is not None:
        print(f"[bench] using TRAINED checkpoint: {trained}", file=sys.stderr)
        return trained
    key = f"b{BATCH}_n{NUM_POINT}_r{'-'.join(str(r) for r in RADII)}"
    cached = os.path.join(BENCH_CACHE, key)
    if os.path.exists(os.path.join(cached, "ckpt", "model.msgpack")):
        return cached
    if os.path.exists(cached):  # partial build: clear, or RunDir would
        import shutil           # auto-number a subdirectory instead

        shutil.rmtree(cached)
    return _build_run_at(cached)


def _build_run_at(log_dir) -> str:
    cfg = Config(
        model="experts_n_est",
        log_dir=log_dir,
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
    # Init ON THE CPU BACKEND with a tiny batch: parameter shapes don't
    # depend on batch size, and initializing on the accelerator means
    # fetching ~2 GB (params + Adam moments) back through the download
    # tunnel (~1.5 MB/s) just to serialize it — measured at ~24 minutes.
    init_b = 4
    batch = {
        "points": rng.uniform(
            -1, 1, size=(init_b, len(RADII) * NUM_POINT, 3)
        ).astype(np.float32),
        "n_eff": np.full((init_b, len(RADII)), NUM_POINT, np.int32),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        opt_state = make_optimizer(cfg).init(params)
    ckpt_lib.save(
        rd.ckpt_dir, params=params, state=state, opt_state=opt_state, step=0, epoch=0
    )
    return rd.path


def reference_style_rate(run_path: str, root: str) -> float:
    """The reference's execution design on this chip, measured.

    Per step, strictly serial (no host/device overlap, synchronous
    fetch): single-threaded patch extraction -> manager forward -> ALL
    n_experts expert forwards -> argmax on host.  FLOP-identical to the
    reference's dense graph (`test_n_est_w_experts.py:148-152`, where
    every expert runs on every sample); assembled from the per-expert
    programs because the monolithic dense executable exceeds what the
    compile service handles (see ops/pallas docstring on axon limits).
    """
    import functools

    from nestinet_tpu.data.loader import get_data_loader
    from nestinet_tpu.infer.predict import (
        _pad_batch,
        _serving_jit,
        load_run,
        restore_model,
    )

    rd, cfg, gmm, model = load_run(run_path)
    loader, dataset = get_data_loader(
        "benchset.txt", indir=root, batch_size=BATCH,
        patch_radius=cfg.patch_radius, points_per_patch=cfg.num_point,
        outputs=(), seed=cfg.seed, patch_sample_order="full",
        workers=0,
    )
    loader.prefetch = 0  # strictly serial: no background prefetch thread
    sample = next(iter(loader))
    params, state = restore_model(rd, cfg, model, _pad_batch(sample, BATCH))

    # Same programs as the sparse serving pass (shared via the model's
    # serving-jit cache, so nothing recompiles here).
    manager_fn = _serving_jit(model, "manager", lambda: jax.jit(model.apply_manager))
    expert_fns = {
        gi: _serving_jit(
            model,
            f"expert_group_{gi}",
            lambda gi=gi: jax.jit(
                functools.partial(model.apply_expert_member, group_index=gi)
            ),
        )
        for gi in range(len(model.groups))
    }
    table = model.expert_to_group()

    def run_pass(max_batches: int = 40):
        # Serial rate is steady batch-to-batch: 40 batches (~10k
        # patches) bounds the denominator's share of bench wall time.
        n = 0
        t0 = time.perf_counter()
        for bi, batch in enumerate(loader):
            if bi >= max_batches:
                break
            real = batch["points"].shape[0]
            padded = _pad_batch(batch, BATCH)
            db = {
                "points": jnp.asarray(padded["points"]),
                "n_eff": jnp.asarray(padded["n_eff"]),
            }
            probs = np.asarray(manager_fn(params, state, db))  # sync fetch
            outs = []
            for e in range(model.n_experts):  # dense: every expert runs
                gi, member = table[e]
                outs.append(
                    np.asarray(
                        expert_fns[gi](
                            params, state, db, member=jnp.asarray(member, jnp.int32)
                        )
                    )
                )
            idx = np.argmax(probs[:, :real], axis=0)
            _ = np.stack(outs)[idx, np.arange(real)]  # argmax gather (host)
            n += real
        return n / (time.perf_counter() - t0)

    run_pass(max_batches=8)  # warmup (programs already cached by the sparse pass)
    return max(run_pass(), run_pass())  # best-of-two, like the numerator


def main():
    t0 = time.perf_counter()

    def mark(msg):  # progress to stderr; stdout stays one JSON line
        print(f"[bench {time.perf_counter() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    with tempfile.TemporaryDirectory() as root:
        make_shape(root, N_SHAPE_POINTS)
        extraction_rate = reference_proxy_rate(root)
        mark(f"single-thread extraction: {extraction_rate:.1f} patches/s")

        run_path = build_run(root)
        mark("run dir built (jitted init + checkpoint)")

        # TPU-native execution across serving modes x compute dtypes
        # (threaded extraction + one-deep host/device pipelines).
        # Routed sparse (grid FIFO + on-device bucketed expert runs,
        # infer/predict.py:_predict_sparse_moe) is the measured winner
        # in both dtypes since round 2; dense and the fused on-device-
        # extraction pipeline are measured alongside for the record.
        # bfloat16 serves the same float32 checkpoint (master weights
        # stay f32; QUALITY.md pins the RMS delta vs f32).
        from nestinet_tpu.infer.device_pipeline import predict_shapes_device

        rates = {}
        passes = {}
        spread = {}
        warmups = {}
        # Modes whose six-testset RMS is pinned in QUALITY.md within the
        # ±0.1° parity bar of the host-dense float32 anchor (BASELINE.json
        # defines the metric as points/sec AT RMS parity).  The headline
        # `value` is the fastest of THESE; any unpinned mode is recorded
        # as a secondary rate only.  Update alongside QUALITY.md.
        parity_pinned = {
            # QUALITY.md round-5 table (epoch-30 checkpoint, worst
            # per-testset delta vs the host-dense f32 anchor):
            "device_sparse_int8",      # 0.029° (B=1024)
            "device_sparse_bfloat16",  # 0.018° (B=512)
            "sparse_bfloat16",         # 0.008°
            "dense_bfloat16",          # ≡ sparse (tests pin equality)
        }
        sweep = [
            # device_sparse: cloud uploaded once, ball query + MuPS +
            # manager fused into program A, argmax expert via the
            # routing FIFO — removes both the 1-core host extraction
            # ceiling (~3k patches/s) and the 6 skipped experts.
            # (device_dense / sparse_float32 were measured consistently
            # slower — docs/PERF.md — and are dropped here to keep the
            # bench inside the driver's wall budget.)
            # int8 runs the conv/matmul MACs quantized (ops/quant.py) —
            # the only lever past the bf16 conv roofline (PERF.md); RMS
            # delta vs bf16 is pinned in QUALITY.md.
            # The headline int8 mode runs at B=1024: the batch sweeps
            # (PERF.md rounds 4-5) measured program A scaling ~linearly
            # to 1024 while fixed terms amortize, and B=2048 regressing
            # (superlinear program A + FIFO-window collapse).  bf16
            # device serving runs at B=512 — its measured-better
            # operating point once the round-4 compile cliff was
            # root-caused to the old CSR window math and fixed (PERF.md
            # round 5) — and is pinned there (QUALITY.md round-5
            # addendum, worst delta 0.018°).  QUALITY.md pins int8 RMS
            # at B=1024 (activation-quant scales are per-tensor over
            # the batch, so B changes numerics).
            ("device_sparse", "int8", 1024),
            ("device_sparse", "bfloat16", 512),
            ("sparse", "bfloat16", BATCH),
            ("dense", "bfloat16", BATCH),
        ]
        mode_batch = {}
        for mode, dtype, mbatch in sweep:
            name = f"{mode}_{dtype or 'cfg'}"
            mode_batch[name] = mbatch
            if mode.startswith("device"):
                # upload the cloud once; ball query + MuPS + CNN fused
                # into one program per batch (ops/ball_query.py)
                def run(tag, _m=mode.split("_", 1)[1], _d=dtype, _b=mbatch):
                    return predict_shapes_device(
                        run_path, dataset_name=tag, testset="benchset.txt",
                        data_path=root, batch_size=_b,
                        moe_inference=_m, compute_dtype=_d,
                    )
            else:
                def run(tag, _m=mode, _d=dtype, _b=mbatch):
                    return predict_shapes(
                        run_path, dataset_name=tag, testset="benchset.txt",
                        data_path=root, batch_size=_b, loader_workers=8,
                        moe_inference=_m, compute_dtype=_d,
                    )
            try:
                tw0 = time.perf_counter()
                run(f"warm_{name}")
                warmups[name] = round(time.perf_counter() - tw0, 1)
                mark(f"{name} warmup done in {warmups[name]:.0f}s "
                     "(programs compiled)")
                # Two measured passes, best-of: relay latency drifts over
                # the bench's ~10 min and contention only ever slows a
                # pass, so max is the low-variance estimator.  BOTH passes
                # and their spread go into the artifact (VERDICT r3 weak
                # #3: a silent max() can let one outlier pass inflate the
                # headline) — read the spread before trusting the rate.
                r1 = run(f"bench_{name}")["patches_per_sec"]
                r2 = run(f"bench2_{name}")["patches_per_sec"]
                rates[name] = max(r1, r2)
                passes[name] = [round(r1, 2), round(r2, 2)]
                spread[name] = round(abs(r1 - r2) / max(r1, r2), 3)
                warn = " [SPREAD >10% — rerun before citing]" if (
                    spread[name] > 0.10
                ) else ""
                mark(f"{name} inference: {rates[name]:.1f} patches/s "
                     f"(passes {r1:.0f}/{r2:.0f}, spread "
                     f"{spread[name] * 100:.1f}%){warn}")
            except Exception as e:  # one mode must not kill the bench
                # (e.g. a backend/compiler rejecting int8 convs)
                mark(f"{name} FAILED ({type(e).__name__}: {e}) — skipped")
        pinned_rates = {k: v for k, v in rates.items() if k in parity_pinned}
        ours = max(pinned_rates.values())
        headline_mode = max(pinned_rates, key=pinned_rates.get)
        if ours < max(rates.values()):
            mark(f"note: fastest mode overall is NOT parity-pinned; "
                 f"headline stays {headline_mode}")

        # The denominator gets the same treatment (best-of-two) so
        # relay drift cannot inflate the ratio.
        ref_rate = reference_style_rate(run_path, root)
        mark(f"reference-style serial rate: {ref_rate:.1f} patches/s")

    print(
        json.dumps(
            {
                "metric": "pcpnet_moe_inference_points_per_sec_per_chip",
                "value": round(ours, 2),
                "unit": "points/s",
                # one patch predicts one query point's normal, so
                # patches/s == points/s (ADVICE r4: the metric name and
                # the prose "patches/s" are the same quantity)
                "unit_note": "1 patch = 1 query point; patches/s == points/s",
                "vs_baseline": round(ours / ref_rate, 2),
                # provenance fields (VERDICT r2): the denominator is
                # relay-RTT-bound and drifts with relay weather — record
                # it so the ratio's movement is attributable — plus every
                # measured mode and which mode the headline is.
                "headline_mode": headline_mode,
                "ref_points_per_sec": round(ref_rate, 2),
                "mode_rates": {k: round(v, 2) for k, v in rates.items()},
                # per-pass rates + relative spread (|r1-r2|/max) so one
                # outlier pass can't silently inflate a headline, and
                # per-mode warmup/compile seconds so the static-shape
                # design's operational cost stays visible and trackable.
                "mode_passes": passes,
                "mode_spread": spread,
                "mode_spread_warn": sorted(
                    k for k, v in spread.items() if v > 0.10
                ),
                "mode_warmup_s": warmups,
                "mode_batch": mode_batch,
                "parity_pinned_modes": sorted(parity_pinned & set(rates)),
            }
        )
    )


if __name__ == "__main__":
    main()
