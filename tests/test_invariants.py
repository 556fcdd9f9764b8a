"""State-invariant validation across an e2e run (SanityCheck parity)."""
import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.filter.validate import validate_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def test_invariants_hold_through_run():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           propagation_mode="fast")
    fi, gt = build_pcw_stream(cfg, total_time=8.0, noise_px=0.5)
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    errs0 = validate_state(cfg, s)
    assert not errs0, errs0

    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    errs = validate_state(cfg, s)
    assert not errs, errs
