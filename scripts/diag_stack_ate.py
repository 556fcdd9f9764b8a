"""Bisect the consistency-stack ATE gap vs the base filter (round-5:
consistency_ate target <= 1.5x base ATE).

Single-sequence CPU runs of the bench PCW world (f32/sqrt/fast like the
bench consistency stage) with stack knobs toggled one at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
from xivo_tpu.sim.configs import PCW_CFG

STACK = dict(use_OOS=True, clone_frame_groups=True, use_fej=True,
             approximate_init_covariance=True)

VARIANTS = [
    ("base", {}),
    ("clone", dict(clone_frame_groups=True)),
    ("oos+clone", dict(use_OOS=True, clone_frame_groups=True)),
    ("oos+clone nocomp", dict(use_OOS=True, clone_frame_groups=True,
                              use_compression=False)),
    ("stack", STACK),
    ("stack-fej", {**STACK, "use_fej": False}),
    ("stack-initcov", {**STACK, "approximate_init_covariance": False}),
    ("stack-oos", {**STACK, "use_OOS": False}),
    ("stack nocomp", {**STACK, "use_compression": False}),
]
if os.environ.get("VARIANTS"):
    keep = os.environ["VARIANTS"].split(",")
    VARIANTS = [v for v in VARIANTS if v[0] in keep]

TT = float(os.environ.get("TT", "5.0"))

for name, over in VARIANTS:
    cfg = config_from_json(PCW_CFG, dtype="float32",
                           sim_initialize_depths=True,
                           propagation_mode="fast",
                           covariance_form="sqrt", **over)
    fi, gt = build_pcw_stream(cfg, total_time=TT, noise_px=0.25)
    s = init_state(cfg)
    dt = np.dtype(cfg.dtype)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], dt),
                   last_accel=jnp.asarray(gt["accel0"], dt))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))
    half = err.shape[0] // 2
    tail = float(np.sqrt(np.mean(err[half:] ** 2)))
    print(f"{name:18s} ATE {ate:.4f}  tailRMSE {tail:.4f}  "
          f"final {err[-1]:.4f}", flush=True)
