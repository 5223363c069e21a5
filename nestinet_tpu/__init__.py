"""nestinet_tpu: a TPU-native normal-estimation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of Nesti-Net
(CVPR 2019, arXiv:1812.00709): multi-scale 3D modified Fisher Vector (MuPS)
point statistics, 3D-Inception CNNs, and a mixture-of-experts normal
estimator, plus the single-scale / multi-scale / noise-switching ablations,
the PCPNet patch data pipeline, streaming whole-shape inference, and the
RMS/PGP evaluation protocol.

Layout:
    ops/      grid GMM, 3DmFV / MuPS kernels (jnp + Pallas), NN building blocks
    models/   ss / ms / switching / experts (MoE) model definitions (haiku)
    data/     PCPNet IO, kd-tree patch pipeline, samplers, augmentations
    train/    schedules, train step, mesh/sharding, trainer loop
    infer/    streaming whole-shape inference + .normals writers
    eval/     metric protocol (RMS / PGP5 / PGP10) + summaries
    core/     config, run-dir contract, checkpointing, logging
"""

__version__ = "0.1.0"
