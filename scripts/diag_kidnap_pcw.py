"""Prototype: kidnap-recovery study on the CHEAP PCW world.

POINTCLOUD-mode descriptors are id-derived (pipeline.tracker_pointcloud
splitmix32), so the full mapper stack runs without imagery. Used to
calibrate the default-tier micro kidnap pin
(tests/test_headline_micro.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.map import init_map
from xivo_tpu.map.integration import vio_frame_mapped
from xivo_tpu.sim.stream import build_pcw_stream
from xivo_tpu.sim.configs import PCW_CFG


def run(use_lc, total_time=16.0, kick_time=8.0, seed=0,
        bias_walk_gyro=0.0, bias_walk_accel=0.0, motion="loop",
        world=None, n_points=600, **cfg_over):
    from run_longhorizon_mapped import inject_global_drift
    from xivo_tpu.geom import so3

    vsb = {"loop": (0.9, 0.0, 0.45),
           "bigloop": (2.7, 0.0, 0.45)}[motion]
    over = dict(X_Vsb=vsb)  # loop motions start mid-orbit
    if bias_walk_gyro > 0 or bias_walk_accel > 0:
        # filter's bias process noise matched to the true walk
        over.update(Qimu_gyro_bias=(bias_walk_gyro,) * 3,
                    Qimu_accel_bias=(bias_walk_accel,) * 3,
                    P_bg=0.01, P_ba=0.05)
    over.update(cfg_over)
    cfg = config_from_json(
        PCW_CFG, dtype="float64", sim_initialize_depths=True,
        use_mapper=True, detect_loop_closures=use_lc,
        lc_keyframe_every=8, lc_min_age_frames=120,
        lc_nn_dist_thresh=5, lc_min_matches=5, **over)
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25,
                              motion=motion, seed=seed, world=world,
                              n_points=n_points,
                              bias_walk_gyro=bias_walk_gyro,
                              bias_walk_accel=bias_walk_accel)
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    ms = init_map(2048, dtype=jnp.float64)
    from functools import partial
    step = jax.jit(partial(vio_frame_mapped, cfg))

    T = int(fi.frame_dt.shape[0])
    kick_frame = int(kick_time / (total_time / T))
    errs, lcs = [], []
    Rk = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, 0.05])))
    tk = np.array([0.3, -0.25, 0.2])
    for t in range(T):
        if kick_time > 0 and t == kick_frame:
            s = inject_global_drift(cfg, s, Rk, tk,
                                    sigma_T=float(np.linalg.norm(tk)),
                                    sigma_W=0.05)
        s, ms, out, n_lc = step(s, ms, fi.gyro[t], fi.accel[t],
                                fi.imu_dt[t], fi.frame_dt[t],
                                fi.meas_id[t], fi.meas_xp[t],
                                fi.meas_depth[t], fi.meas_valid[t])
        errs.append(np.linalg.norm(np.asarray(out.Tsb) - gt["Tsb"][t]))
        lcs.append(int(n_lc))
    errs = np.asarray(errs)
    post = errs[kick_frame + 10:] if kick_time > 0 else errs[T // 2:]
    return dict(rmse=float(np.sqrt(np.mean(errs ** 2))),
                post_kick_rmse=float(np.sqrt(np.mean(post ** 2))),
                tail_rmse=float(np.sqrt(np.mean(errs[-60:] ** 2))),
                n_lc=int(np.sum(lcs)), map_count=int(ms.count),
                final=float(errs[-1]))


if __name__ == "__main__":
    for lc in (True, False):
        t0 = time.perf_counter()
        r = run(lc)
        print(f"lc={lc}: {r} wall={time.perf_counter()-t0:.0f}s",
              flush=True)
