"""End-to-end PCW VIO run (debug/eval driver).

Mirrors scripts/pyxivo_pcw.py of the reference: IMU sim + point-cloud
world -> streaming Estimator -> trajectory error vs ground truth.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

if os.environ.get("XIVO_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["XIVO_PLATFORM"])
    if os.environ["XIVO_PLATFORM"] == "cpu":
        jax.config.update("jax_enable_x64", True)

from xivo_tpu.api import Estimator
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.sim import RandomPCW, get_imu_sim

PCW_CFG = {
    "simulation": True,
    "integration_method": "PrinceDormand",
    "PrinceDormand": {"stepsize": 0.002},
    "use_MH_gating": True,
    "use_1pt_RANSAC": False,
    "triangulate_pre_subfilter": False,
    "max_group_lifetime": 60,
    "remove_outlier_counter": 10,
    "feature_owner_change_cov_factor": 1.5,
    "group_degrees_fixed": 6,
    "gravity": [0, 0, -9.8],
    "X": {"Wsb": [0, 0, 0], "Tsb": [0, 0, 0], "Vsb": [0, 0, 0],
          "bg": [0, 0, 0], "ba": [0, 0, 0],
          "Wbc": [-1.57079633, 0, 0], "Tbc": [0, 0, 0],
          "Wsg": [0, 0], "td": 0.0},
    "P": {"Wsb": 0.001, "Tsb": 0.001, "Vsb": 0.5, "bg": 1e-10, "ba": 1e-10,
          "Wbc": 1e-10, "Tbc": 1e-10, "Wsg": 1e-10},
    "Qmodel": {"Wsb": 0.01, "Vsb": 0.01, "Wbc": 0, "Wsg": 0},
    "Qimu": {"gyro": [5e-3] * 3, "gyro_bias": [0.0] * 3,
             "accel": [5e-2] * 3, "accel_bias": [0.0] * 3},
    "initial_z": 2.5, "initial_std_x": 1.0, "initial_std_y": 1.0,
    "initial_std_z": 0.5,
    "initial_std_x_badtri": 1.0, "initial_std_y_badtri": 1.0,
    "initial_std_z_badtri": 0.5,
    "max_subfilter_outlier": 0.01,
    "strict_criteria_timesteps": 5,
    "visual_meas_std": 1.0,
    "max_depth": 30.0, "min_depth": 0.05,
    "adaptive_initial_depth": {"median_weight": 0.99,
                               "minimum_feature_lifetime": 5},
    "subfilter": {"visual_meas_std": 3.5, "ready_steps": 2,
                  "MH_thresh": 8.991},
    "triangulation": {"method": "direct_linear_transform_avg",
                      "zmin": 0.05, "zmax": 60.0},
    "min_inliers": 15,
    "MH_thresh": 100.0, "MH_adjust_factor": 1.15,
    "num_gauge_xy_features": 3,
    "group_degrees_fixed": 6,
    "camera_cfg": {"model": "pinhole", "rows": 480, "cols": 640,
                   "fx": 275, "fy": 275, "cx": 320, "cy": 240},
    "tracker_cfg": {"num_features_min": 150, "num_features_max": 200,
                    "max_pixel_displacement": 500},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-total_time", type=float, default=10.0)
    ap.add_argument("-imu_dt", type=float, default=0.01)
    ap.add_argument("-vision_dt", type=float, default=0.05)
    ap.add_argument("-motion", type=str, default="gentle")
    ap.add_argument("-npts", type=int, default=600)
    ap.add_argument("-noise_px", type=float, default=0.5)
    ap.add_argument("-noise_accel", type=float, default=1e-4)
    ap.add_argument("-noise_gyro", type=float, default=1e-5)
    ap.add_argument("-use_sim_depth", action="store_true")
    ap.add_argument("-depth_gate", type=float, default=-1.0,
                    help="parallax-gated admission threshold (log-depth "
                    "variance); recommended 0.01 when NOT using "
                    "-use_sim_depth")
    ap.add_argument("-dtype", type=str, default="float64")
    ap.add_argument("-verbose", action="store_true")
    args = ap.parse_args()

    imu = get_imu_sim(args.motion, T=args.total_time + 1.0,
                      noise_accel=args.noise_accel,
                      noise_gyro=args.noise_gyro, seed=1)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=args.npts,
                    seed=0)
    cfg = config_from_json(PCW_CFG)
    over = {"dtype": args.dtype}
    if args.depth_gate > 0:
        over["max_depth_var_for_admission"] = args.depth_gate
    cfg = cfg.__class__(**{**cfg.__dict__, **over})
    est = Estimator(cfg)
    if args.use_sim_depth:
        est.InitWithSimDepths()

    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    Rbc, Tbc = est.gbc()

    # interleave packets (IMU first on ties) like pyxivo_pcw.py:106-118
    t_imu = np.arange(0, args.total_time, args.imu_dt)
    t_vis = np.arange(0, args.total_time, args.vision_dt)
    packets = sorted([(t, 0) for t in t_imu] + [(t, 1) for t in t_vis])

    errs = []
    t0 = time.time()
    nf = 0
    for (t, kind) in packets:
        if kind == 0:
            a, g = imu.meas(t)
            est.InertialMeas(t, g, a)
        else:
            Rsb, Tsb = imu.gsb(t)
            Rsc = Rsb @ Rbc
            Tsc = Rsb @ Tbc + Tsb
            ids, xpd = pcw.generate_measurements(Rsc, Tsc, K, 640, 480,
                                                 args.noise_px)
            est.VisualMeasPointCloud(t, ids, xpd)
            nf += 1
            _, Tsb_est = est.gsb()
            err = np.linalg.norm(Tsb_est - Tsb)
            errs.append((t, err))
            if args.verbose and nf % 20 == 0:
                print(f"t={t:6.2f} err={err:7.4f} nmeas={len(ids):4d} "
                      f"instf={est.num_instate_features():3d} "
                      f"instg={est.num_instate_groups():2d} "
                      f"tracked={est.num_tracked_features():3d} "
                      f"mh_rej={est.num_mh_rejected():3d} "
                      f"inn={est.inn_rms():6.3f}")
    wall = time.time() - t0
    errs = np.asarray(errs)
    rmse = float(np.sqrt(np.mean(errs[:, 1] ** 2)))
    print(f"frames={nf} wall={wall:.1f}s fps={nf / wall:.1f} "
          f"ATE-RMSE={rmse:.4f} m  final-err={errs[-1, 1]:.4f} m")
    return rmse


if __name__ == "__main__":
    main()
