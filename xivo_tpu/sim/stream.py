"""Build packed frame-input streams from the simulator (bench/test glue)."""
from __future__ import annotations

import numpy as np

from ..filter.config import VIOConfig
from ..runner import FrameInputs, pack_frame_inputs
from .imu_sim import IMUSim, get_imu_sim
from .pcw import RandomPCW


def _generate_with_cfg_camera(pcw, cfg: VIOConfig, Rsc, Tsc, imw, imh,
                              noise_px_std):
    """Project world points through the config's (possibly distorted)
    camera model — makes non-pinhole models testable end-to-end."""
    import jax
    import jax.numpy as jnp
    from .. import cam as cam_mod
    kind, intrin, _ = cam_mod.intrinsics_from_cfg(
        dict(model=cfg.cam_model, rows=imh, cols=imw,
             fx=cfg.cam_params[2], fy=cfg.cam_params[3],
             cx=cfg.cam_params[4], cy=cfg.cam_params[5],
             **{k: v for k, v in zip(
                 ("p1", "p2", "k1", "k2", "k3") if cfg.cam_model ==
                 "radtan" else ("k0", "k1", "k2", "k3")
                 if cfg.cam_model in ("equi", "equidistant") else ("w",),
                 cfg.cam_params[6:])}))
    Xc = (pcw.Xs - Tsc[None, :]) @ Rsc
    z = Xc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        xn = Xc[:, :2] / z[:, None]
    xp = np.asarray(jax.vmap(
        lambda v: cam_mod.project(kind, intrin, v))(jnp.asarray(xn)))
    vis = (z > 0.1) & np.isfinite(xp).all(axis=1) \
        & (xp[:, 0] >= 0) & (xp[:, 1] >= 0) \
        & (xp[:, 0] <= imw) & (xp[:, 1] <= imh)
    # polynomial distortion models (radtan) fold large off-axis angles
    # back into the image; restrict to the invertible region like a real
    # lens hood would
    if cfg.cam_model == "radtan":
        vis &= np.linalg.norm(xn, axis=1) < 0.8
    if noise_px_std > 0:
        xp = xp + noise_px_std * pcw.rng.standard_normal(xp.shape)
    newly = vis & (pcw.ids < 0)
    n_new = int(newly.sum())
    pcw.ids[newly] = np.arange(pcw.next_id, pcw.next_id + n_new)
    pcw.next_id += n_new
    pcw.ids[~vis] = -1
    return pcw.ids[vis].copy(), np.concatenate(
        [xp[vis], z[vis, None]], axis=1)


def build_pcw_stream(cfg: VIOConfig, total_time=10.0, imu_dt=0.01,
                     vision_dt=0.05, motion="gentle", n_points=600,
                     noise_px=0.5, noise_accel=1e-4, noise_gyro=1e-5,
                     seed=1, world_seed=0, imu_cap=32, meas_cap=256,
                     true_Rbc=None, true_Tbc=None, true_Cg=None,
                     true_Ca=None, true_td=0.0, true_K=None, world=None,
                     use_cfg_camera=False, bias_walk_accel=0.0,
                     bias_walk_gyro=0.0, bias_gyro=None, bias_accel=None):
    """Simulate and pack one sequence. Returns (FrameInputs, gt dict).

    The ``true_*`` arguments inject ground-truth calibration that may
    differ from the config's initial guesses — the test harness for the
    online self-calibration states (cf. cfg/phab_calibration.json and the
    USE_ONLINE_*_CALIB flags of the reference):
      * true_Rbc/true_Tbc — actual camera-body extrinsics used to render.
      * true_Cg/true_Ca — raw IMU measurements are premultiplied by the
        inverses (model: calibrated = C @ raw - bias).
      * true_td — images render the scene at (t + true_td) but carry
        timestamp t (camera clock lags the IMU clock by td).
    """
    imu_kw = dict(T=total_time + 1.0, noise_accel=noise_accel,
                  noise_gyro=noise_gyro, seed=seed,
                  bias_walk_accel=bias_walk_accel,
                  bias_walk_gyro=bias_walk_gyro)
    if bias_gyro is not None:
        imu_kw["bias_gyro"] = np.asarray(bias_gyro, float)
    if bias_accel is not None:
        imu_kw["bias_accel"] = np.asarray(bias_accel, float)
    imu = get_imu_sim(motion, **imu_kw)
    if isinstance(world, str) and world == "tube":
        # landmarks in a band around the actual trajectory — sustained
        # visibility for long-horizon runs (see sim/pcw.py TubePCW)
        from .pcw import TubePCW
        path = np.stack([imu.gsb(t)[1]
                         for t in np.arange(0, total_time, 0.25)])
        pcw = TubePCW(path, n_points=max(n_points, 2000), seed=world_seed)
    elif world is not None:
        pcw = world
    else:
        pcw = RandomPCW(
            [-10, 10], [-10, 10], [-5, 5], n_points=n_points,
            seed=world_seed)
    rows, cols = int(cfg.cam_params[0]), int(cfg.cam_params[1])
    fx, fy, cx, cy = cfg.cam_params[2:6]
    K = np.asarray(true_K) if true_K is not None \
        else np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    import jax.numpy as jnp
    from ..geom import so3
    Rbc = np.asarray(true_Rbc) if true_Rbc is not None \
        else np.asarray(so3.exp(jnp.asarray(cfg.X_Wbc)))
    Tbc = np.asarray(true_Tbc) if true_Tbc is not None \
        else np.asarray(cfg.X_Tbc)
    Cg_inv = np.linalg.inv(true_Cg) if true_Cg is not None else None
    Ca_inv = np.linalg.inv(true_Ca) if true_Ca is not None else None

    t_imu = np.arange(0, total_time, imu_dt)
    t_vis = np.arange(0, total_time, vision_dt)

    frames = []
    gt = {"t": [], "Rsb": [], "Tsb": [], "Vsb": []}
    pending = []
    t_prev = 0.0
    ii = 0
    for tv in t_vis:
        while ii < len(t_imu) and t_imu[ii] <= tv:
            t = t_imu[ii]
            if t == 0.0:
                ii += 1
                continue  # the t=0 sample seeds the state, no propagation
            a, g = imu.meas(t)
            if Cg_inv is not None:
                g = Cg_inv @ g
            if Ca_inv is not None:
                a = Ca_inv @ a
            pending.append((t - t_prev, g, a))
            t_prev = t
            ii += 1
        Rsb, Tsb = imu.gsb(tv + true_td)
        Rsc = Rsb @ Rbc
        Tsc = Rsb @ Tbc + Tsb
        if use_cfg_camera:
            ids, xpd = _generate_with_cfg_camera(
                pcw, cfg, Rsc, Tsc, cols, rows, noise_px)
        else:
            ids, xpd = pcw.generate_measurements(Rsc, Tsc, K, cols, rows,
                                                 noise_px)
        frames.append(dict(imu=pending, frame_dt=max(tv - t_prev, 0.0),
                           ids=ids, xp=xpd[:, :2], depth=xpd[:, 2]))
        pending = []
        t_prev = tv
        gt["t"].append(tv)
        gt["Rsb"].append(Rsb)
        gt["Tsb"].append(Tsb)
        gt["Vsb"].append(imu.Vsb(tv))

    dtype = np.float32 if cfg.dtype == "float32" else np.float64
    fi = pack_frame_inputs(frames, imu_cap=imu_cap, meas_cap=meas_cap,
                           dtype=dtype)
    gt = {k: np.asarray(v) for k, v in gt.items()}
    # true (possibly walking) IMU biases at the vision stamps — the
    # online-calibration tests track these, not just the constants
    gt["bg"] = np.stack([imu.bias_gyro_t(tv) for tv in t_vis])
    gt["ba"] = np.stack([imu.bias_accel_t(tv) for tv in t_vis])
    # seed sample for state.last_gyro/accel
    a0, g0 = imu.meas(0.0)
    gt["gyro0"], gt["accel0"] = g0, a0
    return fi, gt
