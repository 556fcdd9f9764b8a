"""TUM-VI full-dress rehearsal, long form (>=60 s).

Streams textured 512x512 EQUIDISTANT renders through the complete
TUM-VI configuration (gravity init from rest, prediction-seeded LK,
descriptor rescue, homography RANSAC — tests/test_tumvi_rehearsal.py
holds the short-form assertions) and evaluates with the BASELINE ATE
protocol (Horn alignment, eval/metrics.py — the TUM benchmark scripts'
math). This is the de-risking stand-in for the room1-6 runs that need
dataset bytes (BASELINE.md).

Usage:
  python scripts/run_tumvi_rehearsal.py [-total_time 60] [-out out/...]
  (TPU by default; XIVO_PLATFORM=cpu for CPU)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-total_time", type=float, default=60.0)
    ap.add_argument("-out", default="")
    ap.add_argument("-dtype", default="float32")
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args()

    from tests.test_tumvi_rehearsal import run_rehearsal
    from xivo_tpu.eval.metrics import ate_rmse

    t0 = time.perf_counter()
    est, errs, counts, gts, times, ests = run_rehearsal(
        total_time=args.total_time, dtype=args.dtype, seed=args.seed)
    wall = time.perf_counter() - t0

    raw_rmse = float(np.sqrt(np.mean(errs ** 2)))
    # BASELINE protocol: Horn-aligned ATE (run_and_eval_pyxivo.py's
    # evaluate_ate math, eval/metrics.py)
    aligned, _, _ = ate_rmse(times, ests, times, gts)
    print(f"frames={len(errs)} wall={wall:.1f}s "
          f"fps={len(errs) / wall:.1f}")
    print(f"raw ATE-RMSE={raw_rmse:.4f} m  aligned ATE-RMSE="
          f"{aligned:.4f} m  final-err={errs[-1]:.4f} m")
    print(f"tracked: min={counts.min()} median={int(np.median(counts))} "
          f"max={counts.max()}")
    print(f"instate features={est.num_instate_features()} "
          f"groups={est.num_instate_groups()}")
    P = est.P()
    print(f"covariance finite: {np.isfinite(P).all()}")

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        np.savez(args.out, errs=errs, counts=counts, ts=times)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
