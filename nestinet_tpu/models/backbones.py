"""Backbone layer specs for the 3D-Inception CNNs.

Each spec is a list of ("incep", n_filters, (k1, k2)) and
("maxpool", kernel, stride) entries consumed by `ops.nn.run_backbone`.
Sources (reference file:line) are cited per spec; kernel pairs and filter
widths are parity-exact.
"""


def incep(n, ks):
    return ("incep", n, ks)


def maxpool(k=2, s=2):
    return ("maxpool", k, s)


# Manager / gating CNN for 8^3 grids (`experts_n_est.py:181-215`).
CONV_NET_8G = [
    incep(128, (3, 5)),
    incep(256, (3, 5)),
    incep(256, (3, 5)),
    maxpool(2, 2),
    incep(512, (2, 4)),
    incep(512, (2, 4)),
    maxpool(2, 2),
    incep(512, (1, 2)),
    maxpool(2, 2),
]

# Manager / gating CNN for 3^3 grids (`experts_n_est.py:217-240`);
# also the ms-model 3^3 backbone (`ms_norm_est.py:99-116`) and the
# 3^3 expert body (`experts_n_est.py:274-275`).
CONV_NET_3G = [
    incep(128, (2, 3)),
    incep(256, (2, 3)),
    incep(256, (1, 2)),
    incep(512, (1, 2)),
    maxpool(3, 2),
]

# Single-scale model backbone (`ss_norm_est.py:52-66`).
SS_BACKBONE = [
    incep(128, (3, 5)),
    incep(256, (3, 5)),
    incep(256, (3, 5)),
    maxpool(2, 2),
    incep(512, (3, 5)),
    incep(512, (3, 5)),
    maxpool(2, 2),
]

# Multi-scale model backbone for 8^3 grids (`ms_norm_est.py:83-98`).
MS_BACKBONE_8G = [
    incep(128, (3, 5)),
    incep(256, (3, 5)),
    incep(256, (3, 5)),
    maxpool(2, 2),
    incep(512, (3, 4)),
    incep(512, (3, 4)),
    maxpool(2, 2),
]

# Noise-switching model CNN body, shared by the noise-estimation and both
# normal-estimation subnets (`ms_sw_n_est.py:138-200`).
SW_BACKBONE = [
    incep(128, (3, 5)),
    incep(256, (3, 5)),
    incep(256, (3, 5)),
    maxpool(2, 2),
    incep(512, (3, 5)),
    incep(512, (3, 5)),
    maxpool(2, 2),
]


# Single tiny inception block, substituted for EVERY backbone when
# `cfg.tiny_backbone` is set (mesh/sharding dryruns and compile-bound
# tests): model structure, gating, expert grouping and losses are
# unchanged; only the conv depth/width shrinks so XLA:CPU codegen on
# 1-core hosts stays in seconds.
TINY = [
    incep(8, (1, 2)),
    maxpool(2, 2),
]


def expert_backbone_8g(first_width: int):
    """Expert body for 8^3 grids (`experts_n_est.py:249-273`).

    `first_width` is 128 // divider — the reference balances expert
    capacity by shrinking the first inception block of multi-scale
    experts (`experts_n_est.py:253-254`, py2 integer division).
    """
    return [
        incep(first_width, (3, 5)),
        incep(256, (3, 5)),
        maxpool(2, 2),
        incep(256, (2, 4)),
        maxpool(2, 2),
        incep(512, (2, 4)),
        maxpool(2, 2),
    ]
