"""Heterogeneous batch: different sequences in one vmap must evolve
independently and match their single-sequence runs exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import (batch_states, make_batch_runner,
                             make_sequence_runner)
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def test_heterogeneous_batch_independence():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           propagation_mode="fast")
    streams = [build_pcw_stream(cfg, total_time=2.0, noise_px=0.25,
                                seed=s, world_seed=w)
               for (s, w) in [(1, 0), (7, 3)]]

    # single-sequence references
    run1 = make_sequence_runner(cfg)
    singles = []
    for fi, gt in streams:
        s = init_state(cfg)
        s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                       last_accel=jnp.asarray(gt["accel0"]))
        s, outs = run1(s, fi)
        singles.append(np.asarray(outs.Tsb))

    # batched run over the two different sequences
    B = 2
    states = batch_states(cfg, B)
    states = states._replace(
        last_gyro=jnp.stack([jnp.asarray(g["gyro0"]) for _, g in streams]),
        last_accel=jnp.stack([jnp.asarray(g["accel0"])
                              for _, g in streams]))
    fib = jax.tree.map(lambda *xs: jnp.stack(xs),
                       *(fi for fi, _ in streams))
    runB = make_batch_runner(cfg)
    sb, ob = runB(states, fib)
    for b in range(B):
        assert np.allclose(np.asarray(ob.Tsb)[b], singles[b], atol=1e-9), b
    # and the two diverge from each other (they are different worlds)
    assert not np.allclose(singles[0], singles[1], atol=1e-3)
