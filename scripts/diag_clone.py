"""Diagnose the clone_frame_groups ATE regression (VERDICT r4 item 1a).

Runs the bench PCW world (float32/sqrt/fast) base vs +clone_frame_groups
and prints per-frame filter-health counters to localize where the
trajectories diverge.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
from xivo_tpu.sim.configs import PCW_CFG


def run(total_time=5.0, **over):
    from functools import partial
    from xivo_tpu.filter.pipeline import vio_frame

    kw = dict(sim_initialize_depths=True, propagation_mode="fast",
              covariance_form="sqrt")
    kw.update(over)
    cfg = config_from_json(PCW_CFG, dtype="float32", **kw)
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25)
    s = init_state(cfg)
    dt = np.dtype(cfg.dtype)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], dt),
                   last_accel=jnp.asarray(gt["accel0"], dt))

    def step(s, inp):
        gy, ac, idt, fdt, mid, mxp, mdep, mval = inp
        s, out = vio_frame(cfg, s, gy, ac, idt, fdt, mid, mxp, mdep, mval)
        gauge_gid = jnp.where(
            s.gauge_row >= 0,
            s.groups.gid[jnp.maximum(s.gauge_row, 0)], -1)
        return s, (out, s.gauge_row, gauge_gid)

    @partial(jax.jit, donate_argnums=(0,))
    def runf(s, fi):
        return jax.lax.scan(step, s, tuple(fi))

    s, (outs, grow, ggid) = runf(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    ggid = np.asarray(ggid)
    nsw = int(np.sum(ggid[1:] != ggid[:-1]))
    print(f"   gauge switches: {nsw} over {len(ggid)} frames; "
          f"gauge gids {ggid[::8].tolist()}")
    return s, outs, gt, err, rmse


def report(name, s, outs, err, rmse):
    nf = np.asarray(outs.num_instate_features)
    ng = np.asarray(outs.num_instate_groups)
    inn = np.asarray(outs.inn_rms)
    print(f"== {name}: ATE {rmse:.4f} final {err[-1]:.4f}")
    print(f"   instate feats mean {nf.mean():.1f} min {nf.min()} "
          f"max {nf.max()}")
    print(f"   instate groups mean {ng.mean():.1f} min {ng.min()} "
          f"max {ng.max()}")
    print(f"   inn_rms mean {np.nanmean(inn):.3f}")
    T = len(err)
    for k in range(0, T, max(T // 12, 1)):
        print(f"   t{k:3d} err {err[k]:.4f} nf {nf[k]:3d} ng {ng[k]:2d} "
              f"mh {np.asarray(outs.num_mh_rejected)[k]:3d} "
              f"inn {inn[k]:.3f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("base", "both"):
        s, outs, gt, err, rmse = run()
        report("base", s, outs, err, rmse)
    if which in ("clone", "both"):
        s, outs, gt, err, rmse = run(clone_frame_groups=True)
        report("clone", s, outs, err, rmse)
