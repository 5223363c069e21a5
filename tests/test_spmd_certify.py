"""Flagship-depth SPMD training certification (heavy tier).

Runs `__graft_entry__.certify_flagship_spmd` on the 8-device virtual
CPU mesh: the FULL 7-expert train step (`train_n_est_w_experts.py:
165-196` scale) is lowered + compiled over a (4 data x 2 expert) mesh
from abstract arrays — no execution, so XLA:CPU's 40 s collective
rendezvous limit is irrelevant — and the compiled executable's
shardings are asserted (the 6-expert group stack and its Adam moments
partition over the expert axis; the singleton group, manager and loss
replicate; the batch shards over data).
"""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.heavy
def test_certify_flagship_spmd_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import __graft_entry__

    sharded = __graft_entry__.certify_flagship_spmd(8)
    # default 7-expert dict: six single-scale experts form one
    # architecture group (shardable over EP=2), the 3-scale expert is a
    # singleton (must replicate)
    assert sharded == {"group0": 6}
