"""Long-horizon full-dress rehearsal WITH the map on (VERDICT r2 #10).

Streams textured 512x512 equidistant renders through the image-mapped
pipeline — LK/FAST/BRIEF front-end, EKF, retirement into the
observation-carrying BigMap, descriptor loop closure against the
(periodically BA-refined) landmark table — and measures long-run drift
with/without loop closure. The full composition the reference only
sketches: Mapper::DetectLoopClosures (src/mapper.cpp:335-418) +
the never-triggered Optimizer::Solve (src/optimizer.h:2-3) actually
running as refine_map jobs.

Usage:
  XIVO_PLATFORM=cpu python scripts/run_longhorizon_mapped.py \
      -total_time 60 -ab              # both arms (lc on/off)
  python scripts/run_longhorizon_mapped.py -total_time 60 -no_lc
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def inject_global_drift(cfg, s, Rk, tk, sigma_T, sigma_W):
    """Kidnap-style drift injection: transform the WHOLE live window by
    a global offset g' = (Rk, tk) ∘ g — motion pose/velocity, group
    poses, their FEJ snapshots and the OC prior chain move together, so
    the window stays internally consistent and tracking cannot detect
    the offset (features are group-anchored and invariant). Only a map
    built BEFORE the kick can. The pose covariance is inflated to match
    (a real drifted filter carries that uncertainty; the gauge-fixed
    parameterization cannot grow it on its own), which is exactly what
    lets the chi-square LC gate separate true closures (innovation ~
    inflated sigma) from aliased ones (way beyond it).
    """
    import jax.numpy as jnp
    from xivo_tpu.filter import layout as L
    Rk = jnp.asarray(Rk, s.X.Rsb.dtype)
    tk = jnp.asarray(tk, s.X.Tsb.dtype)
    X = s.X._replace(Rsb=Rk @ s.X.Rsb, Tsb=Rk @ s.X.Tsb + tk,
                     Vsb=Rk @ s.X.Vsb)
    gr = s.groups
    act = gr.active[:, None]
    act3 = gr.active[:, None, None]
    gr = gr._replace(
        Rsb=jnp.where(act3, jnp.einsum("ij,gjk->gik", Rk, gr.Rsb), gr.Rsb),
        Tsb=jnp.where(act, gr.Tsb @ Rk.T + tk, gr.Tsb),
        Rsb_fej=jnp.where(act3, jnp.einsum("ij,gjk->gik", Rk, gr.Rsb_fej),
                          gr.Rsb_fej),
        Tsb_fej=jnp.where(act, gr.Tsb_fej @ Rk.T + tk, gr.Tsb_fej))
    s = s._replace(X=X, groups=gr,
                   oc_R=Rk @ s.oc_R, oc_V=Rk @ s.oc_V,
                   oc_T=Rk @ s.oc_T + tk)
    P = s.P
    if P.shape[0] == P.shape[1]:   # full covariance form
        # COMMON-MODE inflation along the global-transform nullspace
        # (filter/update.py::oc_nullspace): drift moves the pose and
        # every group pose together, so the injected uncertainty must
        # be fully correlated across the window. Tracking rows satisfy
        # H N ~ 0 (they cannot observe the offset and do not fight the
        # correction); loop-closure rows are the only ones that collapse
        # it, and they pull the WHOLE window back through the
        # correlations. Block-diagonal pose-only inflation instead
        # yields a 20:1 tug-of-war with the tracking prior (measured:
        # 7% recovery vs full snap-back).
        from xivo_tpu.filter.update import oc_nullspace
        N = np.asarray(oc_nullspace(cfg, s), dtype=np.asarray(P).dtype)
        scale = np.array([sigma_T ** 2 / 3.0] * 3 + [sigma_W ** 2])
        P = P + jnp.asarray((N * scale[None, :]) @ N.T)
    return s._replace(P=P)


def run_arm(total_time, use_lc, dtype="float64", seed=0, vis_dt=0.05,
            imu_dt=0.005, rest_time=0.6, refine_every=8.0,
            refine_iters=8, noise_gyro=1.2e-3, noise_accel=1.2e-2,
            map_capacity=4096, motion="tumvi_room", nn_thresh=None,
            render_noise=2.0, exposure_wobble=0.05, markers=False,
            kick_time=0.0, kick_T=(0.3, -0.25, 0.2), kick_yaw=0.05,
            save_state_at=0.0, state_path=None,
            bias_walk_gyro=0.0, bias_walk_accel=0.0,
            verbose=False, **overrides):
    """One arm of the study. Returns dict of metrics."""
    from xivo_tpu import cam as cam_mod
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.pipeline import propagate_frame, update_step
    from xivo_tpu.filter.state import (FS_READY, TS_DROPPED, TS_TRACKED,
                                       init_state)
    from xivo_tpu.frontend import init_frontend
    from xivo_tpu.frontend.tracker import tracker_image
    from xivo_tpu.geom import so3
    from xivo_tpu.map.bigmap import (init_bigmap, refine_map,
                                     retire_features_obs, as_mapstate)
    from xivo_tpu.map.mapper import close_loop
    from xivo_tpu.sim import get_imu_sim
    from xivo_tpu.sim.texture import TexturedBoxWorld
    from tests.test_tumvi_rehearsal import TUMVI_CFG

    if motion in ("orbit", "loop"):
        # these start mid-motion (no rest segment); seed the true
        # initial velocity (sim/imu_sim.py init_Vsb) and skip rest
        overrides.setdefault("X_Vsb", (0.9, 0.0, 0.45))
        rest_time = 0.0
    cfg = config_from_json(TUMVI_CFG, dtype=dtype, **overrides)
    if nn_thresh is None:
        nn_thresh = cfg.lc_nn_dist_thresh
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    _, intrin, _ = cam_mod.intrinsics_from_cfg(
        dict(model="equidistant", rows=512, cols=512,
             fx=cfg.cam_params[2], fy=cfg.cam_params[3],
             cx=cfg.cam_params[4], cy=cfg.cam_params[5],
             k0=cfg.cam_params[6], k1=cfg.cam_params[7],
             k2=cfg.cam_params[8], k3=cfg.cam_params[9]),
        dtype=jnp.float64)

    sim_kw = dict(rest_time=rest_time) if motion == "tumvi_room" else {}
    imu = get_imu_sim(motion, T=total_time + 1.0,
                      noise_accel=noise_accel,
                      noise_gyro=noise_gyro, seed=seed,
                      # realistic drift source: biases WALK (matching
                      # the filter's Qimu model) instead of sitting at
                      # constants the filter estimates away — the
                      # regime where loop closure pays without an
                      # injected kick (round-4 verdict item 3)
                      bias_walk_gyro=bias_walk_gyro,
                      bias_walk_accel=bias_walk_accel, **sim_kw)
    world = TexturedBoxWorld(kind, np.asarray(intrin), 512, 512,
                             half_extents=(4.0, 4.0, 2.5),
                             texture_scale=4.0, octaves=5, seed=seed,
                             markers=markers)
    Wbc = np.asarray(cfg.X_Wbc, dtype=float)
    Rbc = np.asarray(so3.exp(jnp.asarray(Wbc)))
    Tbc = np.asarray(cfg.X_Tbc, dtype=float)

    s = init_state(cfg)
    fes = init_frontend(cfg)
    bm = init_bigmap(cfg, capacity=map_capacity, obs_cap=8,
                     kf_capacity=256, dtype=jnp.dtype(cfg.dtype))
    # gravity init from the rest segment (host-side, like the API)
    a0, g0 = imu.meas(rest_time / 2)
    s = s._replace(last_gyro=jnp.asarray(g0, s.last_gyro.dtype),
                   last_accel=jnp.asarray(a0, s.last_accel.dtype))

    def step(s, fes, bm, gy, ac, dts, fdt, img):
        s = propagate_frame(cfg, s, gy, ac, dts, fdt)
        s, fes = tracker_image(cfg, s, fes, img)
        fr = s.features
        # retirement: instate features leaving the tracker (reference
        # parity, src/estimator.cpp:1337-1349) PLUS dying READY tracks
        # whose subfilter depth has converged — an improvement the
        # fixed-capacity EKF window makes necessary: with ~30 slots the
        # instate-only map is too sparse for loop closure to ever see
        # 5 simultaneous revisit matches
        conv = fr.Psub[:, 2, 2] < 0.05
        retire = fr.active & (fr.track == TS_DROPPED) \
            & ((fr.sind >= 0) | ((fr.status == FS_READY) & conv))
        bm = retire_features_obs(cfg, s, bm, retire)
        s, out = update_step(cfg, s)
        if cfg.lc_keyframe_every > 0:
            # keyframe-style snapshots (config.py lc_keyframe_every):
            # the death-only map starves on smooth loops
            fr2 = s.features
            do_kf = (s.vision_counter % cfg.lc_keyframe_every) == 0
            kf_mask = fr2.active & (fr2.sind >= 0) \
                & (fr2.track == TS_TRACKED) & do_kf
            bm = retire_features_obs(cfg, s, bm, kf_mask)
        if use_lc:
            s, n_lc = close_loop(cfg, s, as_mapstate(bm),
                                 nn_dist_thresh=nn_thresh,
                                 ransac_thresh=cfg.lc_ransac_thresh,
                                 min_matches=cfg.lc_min_matches)
        else:
            n_lc = jnp.asarray(0, jnp.int32)
        return s, fes, bm, out, n_lc

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))

    rng = np.random.default_rng(seed)
    IMU_CAP = 16
    errs, times, ests, gts = [], [], [], []
    kicked = False
    n_lc_total, n_refine = 0, 0
    chi2_drop = []
    pending = []
    t_prev = rest_time
    next_vis = rest_time + vis_dt
    next_refine = rest_time + refine_every
    n_steps = int(round(total_time / imu_dt))
    for k in range(1, n_steps + 1):
        t = k * imu_dt
        a, g = imu.meas(t)
        if t <= rest_time:
            continue
        pending.append((t, g, a))
        if t + 1e-9 < next_vis:
            continue
        # pack IMU + render + step
        gy = np.zeros((IMU_CAP, 3), np.dtype(cfg.dtype))
        ac = np.zeros((IMU_CAP, 3), np.dtype(cfg.dtype))
        dts = np.zeros((IMU_CAP,), np.dtype(cfg.dtype))
        tp = t_prev
        for i, (ti, gi, ai) in enumerate(pending[:IMU_CAP]):
            gy[i], ac[i], dts[i] = gi, ai, max(ti - tp, 0.0)
            tp = ti
        fdt = max(next_vis - tp, 0.0)
        t_prev = next_vis
        pending = []
        if kick_time > 0 and not kicked and next_vis >= kick_time:
            ky = float(kick_yaw)
            Rk = np.array([[np.cos(ky), -np.sin(ky), 0],
                           [np.sin(ky), np.cos(ky), 0], [0, 0, 1.0]])
            s = inject_global_drift(cfg, s, Rk, np.asarray(kick_T, float),
                                    sigma_T=float(np.linalg.norm(kick_T)),
                                    sigma_W=abs(ky))
            kicked = True
        Rsb, Tsb = imu.gsb(next_vis)
        img = np.asarray(world.render(
            Rsb @ Rbc, Rsb @ Tbc + Tsb,
            exposure=1.0 + exposure_wobble * np.sin(3.0 * t),
            blur_px=0.6, noise_std=render_noise, rng=rng))
        s, fes, bm, out, n_lc = jstep(
            s, fes, bm, jnp.asarray(gy), jnp.asarray(ac),
            jnp.asarray(dts),
            jnp.asarray(np.dtype(cfg.dtype).type(fdt)),
            jnp.asarray(img, np.float32))
        n_lc_total += int(n_lc)
        if state_path and save_state_at > 0 and next_vis >= save_state_at:
            # debug checkpoint: everything needed to replay single
            # frames from here (state, frontend, map, clock)
            import pickle
            with open(state_path, "wb") as f:
                pickle.dump(dict(
                    s=jax.tree.map(np.asarray, s),
                    fes=jax.tree.map(np.asarray, fes),
                    bm=jax.tree.map(np.asarray, bm),
                    t=next_vis, cfg_overrides=overrides), f)
            print(f"saved state at t={next_vis:.2f} -> {state_path}",
                  flush=True)
            save_state_at = 0.0
        Te = np.asarray(out.Tsb)
        errs.append(float(np.linalg.norm(Te - Tsb)))
        times.append(next_vis)
        ests.append(Te)
        gts.append(Tsb)
        next_vis += vis_dt
        if use_lc and next_vis > next_refine:
            bm, chi2 = refine_map(cfg, bm, iters=refine_iters)
            c = np.asarray(chi2)
            c = c[np.isfinite(c)]
            if len(c) >= 2:
                chi2_drop.append(float(c[0] - c[-1]))
            n_refine += 1
            next_refine += refine_every
        if verbose and (len(errs) % 40 == 0
                        or (int(n_lc) > 0
                            and os.environ.get("XIVO_LH_DEBUG"))):
            print(f"  t={next_vis:6.2f} err={errs[-1]:.3f} "
                  f"lc={n_lc_total} (+{int(n_lc)}) refines={n_refine}",
                  flush=True)

    errs = np.asarray(errs)
    times_a = np.asarray(times)
    half = len(errs) // 2
    from xivo_tpu.eval.metrics import ate_rmse
    aligned, _, _ = ate_rmse(times_a, np.asarray(ests),
                             times_a, np.asarray(gts))
    out = dict(rmse=float(np.sqrt((errs ** 2).mean())),
               tail_rmse=float(np.sqrt((errs[half:] ** 2).mean())),
               final=float(errs[-1]), aligned_ate=float(aligned),
               n_lc=n_lc_total, n_refine=n_refine,
               chi2_drop=chi2_drop, map_count=int(bm.count))
    if kick_time > 0:
        # recovery metric: drift error AFTER the kick settles (2 s in)
        post = times_a >= kick_time + 2.0
        out["post_kick_rmse"] = float(np.sqrt((errs[post] ** 2).mean()))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-total_time", type=float, default=60.0)
    ap.add_argument("-dtype", default="float64")
    ap.add_argument("-seed", type=int, default=0)
    ap.add_argument("-no_lc", action="store_true")
    ap.add_argument("-ab", action="store_true",
                    help="run both arms and print the comparison")
    ap.add_argument("-refine_every", type=float, default=8.0)
    ap.add_argument("-motion", default="tumvi_room")
    ap.add_argument("-nn_thresh", type=int, default=-1)
    ap.add_argument("-markers", action="store_true",
                    help="distinctive marker-patch world (unique "
                         "high-contrast tiles; revisit descriptors "
                         "actually match)")
    ap.add_argument("-kick_time", type=float, default=0.0,
                    help="kidnap-style drift injection at this time: "
                         "the whole live window is offset by kick_T/"
                         "kick_yaw with common-mode nullspace "
                         "covariance inflation; only the pre-kick "
                         "map can correct it")
    ap.add_argument("-kick_T", type=float, nargs=3,
                    default=(0.3, -0.25, 0.2))
    ap.add_argument("-kick_yaw", type=float, default=0.05)
    ap.add_argument("-noise_gyro", type=float, default=1.2e-3)
    ap.add_argument("-noise_accel", type=float, default=1.2e-2)
    ap.add_argument("-bias_walk_gyro", type=float, default=0.0,
                    help="true gyro-bias random walk (rad/s/sqrt(s)); "
                         "pair with -set Qimu_gyro_bias if changed")
    ap.add_argument("-bias_walk_accel", type=float, default=0.0)
    ap.add_argument("-set", action="append", default=[],
                    metavar="KEY=VAL",
                    help="config override, e.g. -set lc_keyframe_every=8 "
                         "-set lc_min_age_frames=120 (repeatable)")
    ap.add_argument("-verbose", action="store_true")
    args = ap.parse_args()

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = int(v)
        except ValueError:
            try:
                overrides[k] = float(v)
            except ValueError:
                # bools and string knobs (e.g. covariance_form=sqrt,
                # lc_anchor_rows=true)
                overrides[k] = {"true": True, "false": False}.get(
                    v.lower(), v)

    arms = [True, False] if args.ab else [not args.no_lc]
    res = {}
    for lc in arms:
        t0 = time.perf_counter()
        r = run_arm(args.total_time, lc, dtype=args.dtype,
                    seed=args.seed, refine_every=args.refine_every,
                    motion=args.motion, markers=args.markers,
                    nn_thresh=args.nn_thresh if args.nn_thresh > 0
                    else None,
                    noise_gyro=args.noise_gyro,
                    noise_accel=args.noise_accel,
                    bias_walk_gyro=args.bias_walk_gyro,
                    bias_walk_accel=args.bias_walk_accel,
                    kick_time=args.kick_time,
                    kick_T=tuple(args.kick_T), kick_yaw=args.kick_yaw,
                    verbose=args.verbose, **overrides)
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        res["lc" if lc else "no_lc"] = r
        print(f"[{'LC' if lc else 'no-LC'}] rmse={r['rmse']:.3f} "
              f"tail={r['tail_rmse']:.3f} final={r['final']:.3f} "
              f"ate={r['aligned_ate']:.3f} n_lc={r['n_lc']} "
              f"refines={r['n_refine']} map={r['map_count']} "
              f"wall={r['wall_s']}s", flush=True)
    if args.ab:
        a, b = res["lc"], res["no_lc"]
        print(f"LC reduces tail drift: {b['tail_rmse']:.3f} -> "
              f"{a['tail_rmse']:.3f} "
              f"({100 * (1 - a['tail_rmse'] / max(b['tail_rmse'], 1e-9)):.0f}%)")
        if "post_kick_rmse" in a:
            print(f"LC post-kick recovery: {b['post_kick_rmse']:.3f} -> "
                  f"{a['post_kick_rmse']:.3f} "
                  f"({100 * (1 - a['post_kick_rmse'] / max(b['post_kick_rmse'], 1e-9)):.0f}%)")


if __name__ == "__main__":
    main()
