"""Benchmark: multi-sequence PCW VIO throughput on one chip.

Prints ONE JSON line: frames/s/chip for the full filter pipeline
(IMU propagation + tracker + EKF update per frame), batched over
independent sequences — the throughput axis defined in SURVEY.md §2.6.
Baseline: the reference's 140 FPS single-core replay (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# NOTE: no global jax_default_matmul_precision flag here — the filter
# owns its numerics (float32 matmul-precision scopes inside
# propagate_frame/update_step) and the default covariance form is the
# square-root factor (structurally PSD in any precision).

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def bench_image(B: int):
    """Image-mode (LK/FAST/BRIEF, 512x512) throughput: single-stream
    ms/frame and B-stream batched frames/s/chip. BASELINE.md's ">=140
    FPS-equivalent per chip" is an image-mode claim, so both modes are
    first-class bench metrics (one JSON line still)."""
    import time as _time
    from functools import partial

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from bench_image import build_frames
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.frontend import init_frontend, vio_frame_image

    frames, cfg, imu = build_frames()
    rest = frames[20:60]
    packed = tuple(jnp.stack([f[i] for f in rest]) for i in range(5))

    s = init_state(cfg)
    a0, g0 = imu.meas(0.0)
    s = s._replace(last_gyro=jnp.asarray(g0, np.float32),
                   last_accel=jnp.asarray(a0, np.float32))
    fes = init_frontend(cfg)

    def body(carry, inp):
        s, fes = carry
        gy, ac, dts, fdt, img = inp
        s, fes, out = vio_frame_image(cfg, s, fes, gy, ac, dts, fdt, img)
        return (s, fes), out.Tsb

    @jax.jit
    def run1(s, fes, packed):
        (_, _), Tsb = jax.lax.scan(body, (s, fes), packed)
        return Tsb

    Tsb = run1(s, fes, packed)
    jax.block_until_ready(Tsb)
    t0 = _time.perf_counter()
    Tsb = run1(s, fes, packed)
    jax.block_until_ready(Tsb)
    wall1 = _time.perf_counter() - t0
    single_fps = len(rest) / wall1

    def bodyb(carry, inp):
        s, fes = carry
        gy, ac, dts, fdt, img = inp
        s, fes, out = jax.vmap(partial(vio_frame_image, cfg))(
            s, fes, gy, ac, dts, fdt, img)
        return (s, fes), out.Tsb

    @jax.jit
    def runb(s, fes, packed):
        (_, _), Tsb = jax.lax.scan(bodyb, (s, fes), packed)
        return Tsb

    packed_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x[:, None],
                                   (x.shape[0], B) + x.shape[1:]), packed)
    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(),
                      s)
    fb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(),
                      fes)
    Tsb = runb(sb, fb, packed_b)
    jax.block_until_ready(Tsb)
    t0 = _time.perf_counter()
    Tsb = runb(sb, fb, packed_b)
    jax.block_until_ready(Tsb)
    wallb = _time.perf_counter() - t0
    return single_fps, len(rest) * B / wallb


def main():
    # measured batch sweep on v5e (frames/s/chip), post gather-purge:
    # 128 -> 10940, 256 -> 11493, 512 -> 11470 — saturates ~256
    B = int(os.environ.get("BENCH_BATCH", "256"))
    total_time = float(os.environ.get("BENCH_SECONDS", "5.0"))

    cfg = config_from_json(
        PCW_CFG, dtype="float32", sim_initialize_depths=True,
        propagation_mode=os.environ.get("BENCH_PROP", "fast"),
        covariance_form=os.environ.get("BENCH_COV", "sqrt"))
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25)
    T = int(fi.frame_dt.shape[0])

    def fresh_states():
        s = batch_states(cfg, B)
        dt = np.dtype(cfg.dtype)
        return s._replace(
            last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt),
                                       (B, 3)).copy(),
            last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt),
                                        (B, 3)).copy())

    fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
    run = make_batch_runner(cfg)

    # warmup/compile
    s, outs = run(fresh_states(), fib)
    jax.block_until_ready(outs.Tsb)

    # sanity: the filter must actually track, not just run
    err = np.linalg.norm(np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        s, outs = run(fresh_states(), fib)
    jax.block_until_ready(outs.Tsb)
    wall = (time.perf_counter() - t0) / reps

    fps = B * T / wall
    baseline = 140.0

    # consistency-stack throughput (VERDICT r2 #4): the full recommended
    # accuracy config — OOS harvest + pose cloning + FEJ + correlated
    # init covariance (the ~40x NEES reduction of
    # tests/test_consistency.py) — measured on device so its cost is a
    # bench fact, not a guess
    cons_fields = {}
    if os.environ.get("BENCH_CONSISTENCY", "1") != "0":
        # the remote compile of this (largest) program occasionally
        # drops the connection; retry once before reporting the error
        for attempt in range(2):
            try:
                ccfg = config_from_json(
                    PCW_CFG, dtype="float32", sim_initialize_depths=True,
                    propagation_mode=os.environ.get("BENCH_PROP", "fast"),
                    covariance_form=os.environ.get("BENCH_COV", "sqrt"),
                    use_OOS=True, clone_frame_groups=True, use_fej=True,
                    approximate_init_covariance=True)
                crun = make_batch_runner(ccfg)
                s, outs = crun(fresh_states(), fib)
                jax.block_until_ready(outs.Tsb)
                t0 = time.perf_counter()
                s, outs = crun(fresh_states(), fib)
                jax.block_until_ready(outs.Tsb)
                cwall = time.perf_counter() - t0
                cerr = np.linalg.norm(
                    np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
                cons_fields = {
                    "consistency_fps": round(B * T / cwall, 1),
                    "consistency_ate_rmse_m": round(
                        float(np.sqrt(np.mean(cerr ** 2))), 4),
                }
                break
            except Exception as e:
                cons_fields = {"consistency_error":
                               f"{type(e).__name__}: {e}"[:200]}
                time.sleep(20)

    # image-mode figures (the honest BASELINE comparison; VERDICT r1 #9)
    img_fields = {}
    if os.environ.get("BENCH_IMG", "1") != "0":
        try:
            img_b = int(os.environ.get("IMG_BATCH", "16"))
            img_single, img_batched = bench_image(img_b)
            img_fields = {
                "img_fps": round(img_batched, 1),
                "img_fps_single_stream": round(img_single, 1),
                "img_batch": img_b,
                "img_vs_baseline": round(img_batched / baseline, 3),
            }
        except Exception as e:  # keep the PCW line printing regardless
            img_fields = {"img_error": f"{type(e).__name__}: {e}"[:200]}

    print(json.dumps({
        "metric": "pcw_vio_frames_per_s_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline, 3),
        "pcw_fps": round(fps, 1),
        "batch": B, "frames": T, "wall_s": round(wall, 3),
        "ate_rmse_m": round(rmse, 4),
        **cons_fields,
        **img_fields,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
