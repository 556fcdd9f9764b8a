"""Benchmark: multi-sequence PCW VIO throughput on one chip.

Prints ONE JSON line: frames/s/chip for the full filter pipeline
(IMU propagation + tracker + EKF update per frame), batched over
independent sequences — the throughput axis defined in SURVEY.md §2.6.
Baseline: the reference's 140 FPS single-core replay (BASELINE.md,
/root/reference/README.md:8).

Deadline-proof by design (round-3 verdict #1):
  * stages (PCW sqrt -> consistency stack -> image mode) are measured
    and STAGED under a wall-clock budget (env BENCH_BUDGET_S, default
    420 s); a stage whose estimated compile cost exceeds the remaining
    budget is skipped with a "skipped_for_budget" marker instead of
    blowing the driver timeout;
  * the JAX persistent compilation cache (.jax_cache/) makes repeat
    runs skip the 30-60 s remote compiles entirely;
  * the single JSON line is printed from a finally: block, so partial
    results survive any stage failure; a SIGTERM handler emits the
    partial line even if the driver's timeout fires mid-stage;
  * numeric failures (NaN / divergent ATE) exit nonzero instead of
    hiding in a note string (round-3 verdict #7).
"""
import json
import os
import signal
import sys
import time

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax

# CPU mode for tests of the bench plumbing itself (the session shell
# pins the TPU backend; the env var alone loses to sitecustomize)
if os.environ.get("XIVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["XIVO_PLATFORM"])

# Persistent compilation cache: verified to work through the axon relay
# (cold 1.7 s -> warm 0.25 s on a toy program). Keyed on jaxpr+backend,
# so in-round warming makes the driver's end-of-round run compile-free.
_CACHE_DIR = os.path.join(_REPO, ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# NOTE: no global jax_default_matmul_precision flag here — the filter
# owns its numerics (float32 matmul-precision scopes inside
# propagate_frame/update_step) and the default covariance form is the
# square-root factor (structurally PSD in any precision).

import jax.numpy as jnp
import numpy as np

FIELDS = {}
_EMITTED = False
_EXIT_CODE = 0


def remaining():
    return BUDGET_S - (time.time() - T0)


def emit():
    """Print the single JSON line exactly once."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    FIELDS.setdefault("metric", "pcw_vio_frames_per_s_per_chip")
    FIELDS.setdefault("unit", "frames/s/chip")
    FIELDS["budget_s"] = BUDGET_S
    FIELDS["elapsed_s"] = round(time.time() - T0, 1)
    print(json.dumps(FIELDS), flush=True)


def _on_term(signum, frame):
    # the driver's `timeout` sends SIGTERM before SIGKILL: salvage
    # whatever stages already completed rather than reporting nothing
    FIELDS["truncated_by_signal"] = signum
    emit()
    os._exit(1)


signal.signal(signal.SIGTERM, _on_term)


def stage_pcw():
    """Flagship: sqrt-form filter-mode VIO, B sequences batched."""
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.runner import batch_states, make_batch_runner
    from xivo_tpu.sim.stream import build_pcw_stream
    from xivo_tpu.sim.configs import PCW_CFG

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

    tc = time.time()
    s, outs = run(fresh_states(), fib)       # warmup/compile
    jax.block_until_ready(outs.Tsb)
    compile_s = time.time() - tc

    # sanity: the filter must actually track, not just run
    err = np.linalg.norm(np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    if os.environ.get("BENCH_FAULT") == "pcw_nan":
        rmse = float("nan")       # seeded fault: tests/test_bench.py

    reps = 2
    # prebuilt per-rep states (the runner DONATES its input buffer):
    # state construction is host work, not the system under test
    pre = [fresh_states() for _ in range(reps)]
    jax.block_until_ready(pre[-1].P)
    t0 = time.perf_counter()
    for k in range(reps):
        s, outs = run(pre[k], fib)
    jax.block_until_ready(outs.Tsb)
    wall = (time.perf_counter() - t0) / reps

    fps = B * T / wall
    baseline = 140.0
    FIELDS.update({
        "value": round(fps, 1),
        "vs_baseline": round(fps / baseline, 3),
        "pcw_fps": round(fps, 1),
        "batch": B, "frames": T, "wall_s": round(wall, 3),
        "pcw_compile_s": round(compile_s, 1),
        "ate_rmse_m": round(rmse, 4),
        "device": str(jax.devices()[0]),
    })
    if not np.isfinite(rmse) or rmse > 1.0:
        raise BenchNumericError(f"PCW ATE {rmse} (expected finite, <1 m)")
    _roofline(run, (fresh_states(), fib), wall, "pcw")
    return fib, fresh_states, gt, T, B, compile_s


V5E_PEAK_BF16_FLOPS = 197e12   # TPU v5e (v5 lite) MXU peak, bf16
V5E_HBM_BYTES_S = 819e9        # v5e HBM bandwidth


def _roofline(jitted, args, wall_s, prefix):
    """Utilization accounting from XLA's own cost model (round-4
    verdict item 4): per-program FLOPs + HBM bytes via
    lower().compile().cost_analysis(), turned into achieved TFLOP/s,
    %-of-v5e-peak (MFU), achieved GB/s, %-of-HBM-BW, and which
    resource binds. Lowering re-traces but the compile hits the
    persistent cache; any relay hiccup degrades to absent fields."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        if flops <= 0 and byts <= 0:
            return
        tflops = flops / wall_s / 1e12
        gbps = byts / wall_s / 1e9
        mfu = 100.0 * flops / wall_s / V5E_PEAK_BF16_FLOPS
        hbm = 100.0 * byts / wall_s / V5E_HBM_BYTES_S
        bound = "latency" if max(mfu, hbm) < 5.0 else (
            "hbm" if hbm >= mfu else "mxu")
        FIELDS.update({
            f"{prefix}_tflops": round(tflops, 2),
            f"{prefix}_mfu_pct": round(mfu, 2),
            f"{prefix}_hbm_gbps": round(gbps, 1),
            f"{prefix}_hbm_pct": round(hbm, 2),
            f"{prefix}_bound": bound,
        })
    except Exception:
        pass  # cost model unavailable through this backend — omit


class BenchNumericError(AssertionError):
    """A measured quantity is numerically wrong (NaN / divergence)."""


def stage_consistency(fib, fresh_states, gt, T, B):
    """Recommended accuracy config — OOS harvest + pose cloning +
    pose-only FEJ — measured on device so its cost is a bench fact, not
    a guess (round-2 verdict #4)."""
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.runner import make_batch_runner
    from xivo_tpu.sim.configs import PCW_CFG

    # recommended accuracy config (round-5 study, diag_stack_ate +
    # eval_consistency): OOS harvest + pose cloning + POSE-ONLY FEJ
    # (fej_feature_block=False default — the feature state is
    # ref-relative, so first-estimating it buys no observability
    # protection). This stack dominates on BOTH study worlds: PCW ATE
    # 0.0084 (base 0.0090), tube NEES 4.8/ATE 0.039 (vs 10.5/0.057
    # full-FEJ). The correlated-init pass is intentionally absent: with
    # pose-only FEJ it is harmful (PCW 0.0177, tube NEES 11.9), though
    # it remains the right tool for the full-FEJ stack
    # (tests/test_consistency.py keeps both pinned).
    ccfg = config_from_json(
        PCW_CFG, dtype="float32", sim_initialize_depths=True,
        propagation_mode=os.environ.get("BENCH_PROP", "fast"),
        covariance_form=os.environ.get("BENCH_COV", "sqrt"),
        use_OOS=True, clone_frame_groups=True, use_fej=True)
    crun = make_batch_runner(ccfg)
    s, outs = crun(fresh_states(), fib)
    jax.block_until_ready(outs.Tsb)
    # prebuilt + device-resident inputs (the runner donates argnum 0);
    # re-measure on implausible walls: one warm run through the relay
    # measured 0.045 s for a program whose true wall is ~14 s — a
    # non-blocking completion-signal glitch, not a real timing
    cwall, tries = 0.0, 0
    while tries < 3:
        st = fresh_states()
        jax.block_until_ready(st.P)
        t0 = time.perf_counter()
        s, outs = crun(st, fib)
        jax.block_until_ready(outs.Tsb)
        cwall = time.perf_counter() - t0
        tries += 1
        # strictly-heavier config cannot beat the base-stage wall
        if cwall > 0.5 * FIELDS.get("wall_s", 0.0):
            break
        FIELDS["consistency_remeasured"] = tries
    cerr = np.linalg.norm(np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
    cate = float(np.sqrt(np.mean(cerr ** 2)))
    wall_trusted = cwall > 0.5 * FIELDS.get("wall_s", 0.0)
    FIELDS.update({
        # a wall that still beats the strictly-lighter base stage after
        # all retries is a relay completion-signal glitch, not a
        # measurement — publish null instead of a 566k-f/s-style number
        # (advisor r4 finding #5)
        "consistency_fps": round(B * T / cwall, 1) if wall_trusted
        else None,
        "consistency_ate_rmse_m": round(cate, 4),
    })
    if not wall_trusted:
        FIELDS["consistency_wall_suspect"] = True
    else:
        _roofline(crun, (fresh_states(), fib), cwall, "consistency")
    if not np.isfinite(cate) or cate > 1.0:
        raise BenchNumericError(
            f"consistency ATE {cate} (expected finite, <1 m)")


def stage_image():
    """Image-mode (LK/FAST/BRIEF, 512x512) throughput: single-stream
    ms/frame and B-stream batched frames/s/chip. BASELINE.md's ">=140
    FPS-equivalent per chip" is an image-mode claim, so both modes are
    first-class bench metrics (one JSON line still)."""
    from functools import partial

    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from bench_image import build_frames
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.frontend import init_frontend, vio_frame_image

    baseline = 140.0
    img_b = int(os.environ.get("IMG_BATCH", "16"))

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
    t0 = time.perf_counter()
    Tsb = run1(s, fes, packed)
    jax.block_until_ready(Tsb)
    wall1 = time.perf_counter() - t0
    single_fps = len(rest) / wall1
    FIELDS["img_fps_single_stream"] = round(single_fps, 1)

    # batched mode only if budget allows its (second) compile
    if remaining() < FIELDS.get("pcw_compile_s", 60.0) + 30.0:
        FIELDS["img_batched_skipped_for_budget"] = True
        return

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
                                   (x.shape[0], img_b) + x.shape[1:]),
        packed)
    sb = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (img_b,) + x.shape).copy(), s)
    fb = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (img_b,) + x.shape).copy(), fes)
    Tsb = runb(sb, fb, packed_b)
    jax.block_until_ready(Tsb)
    t0 = time.perf_counter()
    Tsb = runb(sb, fb, packed_b)
    jax.block_until_ready(Tsb)
    wallb = time.perf_counter() - t0
    batched_fps = len(rest) * img_b / wallb
    FIELDS.update({
        "img_fps": round(batched_fps, 1),
        "img_batch": img_b,
        "img_vs_baseline": round(batched_fps / baseline, 3),
    })
    if not np.isfinite(np.asarray(Tsb)).all():
        raise BenchNumericError("image-mode produced non-finite poses")

    # equidistant variant: the room1-shaped fisheye lens, so the image
    # number includes the distortion-model cost the accuracy rehearsal
    # pays (round-4 verdict item 6). Third image compile — budget-gated.
    if remaining() < FIELDS.get("pcw_compile_s", 60.0) + 30.0:
        FIELDS["img_equidistant_skipped_for_budget"] = True
        return
    frames_e, cfg_e, imu_e = build_frames(camera="equidistant")
    rest_e = frames_e[20:60]
    packed_e = tuple(jnp.stack([f[i] for f in rest_e]) for i in range(5))
    s_e = init_state(cfg_e)
    a0, g0 = imu_e.meas(0.0)
    s_e = s_e._replace(last_gyro=jnp.asarray(g0, np.float32),
                       last_accel=jnp.asarray(a0, np.float32))
    fes_e = init_frontend(cfg_e)

    def bodye(carry, inp):
        s, fes = carry
        gy, ac, dts, fdt, img = inp
        s, fes, out = jax.vmap(partial(vio_frame_image, cfg_e))(
            s, fes, gy, ac, dts, fdt, img)
        return (s, fes), out.Tsb

    @jax.jit
    def rune(s, fes, packed):
        (_, _), Tsb = jax.lax.scan(bodye, (s, fes), packed)
        return Tsb

    packed_eb = jax.tree.map(
        lambda x: jnp.broadcast_to(x[:, None],
                                   (x.shape[0], img_b) + x.shape[1:]),
        packed_e)
    seb = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (img_b,) + x.shape).copy(), s_e)
    feb = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (img_b,) + x.shape).copy(), fes_e)
    Tsb = rune(seb, feb, packed_eb)
    jax.block_until_ready(Tsb)
    t0 = time.perf_counter()
    Tsb = rune(seb, feb, packed_eb)
    jax.block_until_ready(Tsb)
    walle = time.perf_counter() - t0
    FIELDS["img_fps_equidistant"] = round(len(rest_e) * img_b / walle, 1)
    if not np.isfinite(np.asarray(Tsb)).all():
        raise BenchNumericError("equidistant image-mode non-finite poses")


_TIMES_PATH = os.path.join(_CACHE_DIR, "bench_stage_times.json")


def _load_stage_times():
    try:
        with open(_TIMES_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_stage_times(d):
    try:
        with open(_TIMES_PATH, "w") as f:
            json.dump(d, f)
    except OSError:
        pass


def main():
    global _EXIT_CODE
    hist = _load_stage_times()
    try:
        # --- stage 1: flagship PCW (always runs; its numbers are the
        # headline and print even if later stages die) ---
        fib, fresh_states, gt, T, B, compile_s = stage_pcw()

        # compile-cost model for the gate: a cold consistency compile is
        # the largest program (~1.5x the base runner); warm-cache runs
        # measure compile_s ~ seconds and sail through every gate.
        # When a PREVIOUS run on this machine measured the stage, trust
        # that (x1.3 margin) over the model — relay compile times vary
        # ~7x between cold / server-cached, and the model alone
        # over-skips after a slow-compile pcw stage.
        cons_est = max(1.5 * compile_s, 20.0)
        img_est = max(2.0 * compile_s, 30.0)
        if "consistency_total_s" in hist:
            cons_est = min(cons_est, 1.3 * hist["consistency_total_s"])
        if "img_total_s" in hist:
            img_est = min(img_est, 1.3 * hist["img_total_s"])

        # --- stage 2: consistency stack ---
        if os.environ.get("BENCH_CONSISTENCY", "1") == "0":
            FIELDS["consistency_disabled"] = True
        elif remaining() < cons_est + 15.0:
            FIELDS["consistency_skipped_for_budget"] = round(remaining(), 1)
        else:
            try:
                tcs = time.time()
                stage_consistency(fib, fresh_states, gt, T, B)
                hist["consistency_total_s"] = round(time.time() - tcs, 1)
            except BenchNumericError as e:
                FIELDS["consistency_numeric_failure"] = str(e)[:200]
                _EXIT_CODE = 2
            except (RuntimeError, OSError) as e:
                # relay / compile-infrastructure failure: report and move
                # on (the PCW number must still print), but only for
                # runtime-class errors — a TypeError/ValueError is a real
                # bug and propagates to the outer handler
                FIELDS["consistency_error"] = \
                    f"{type(e).__name__}: {e}"[:200]

        # --- stage 3: image mode ---
        if os.environ.get("BENCH_IMG", "1") == "0":
            FIELDS["img_disabled"] = True
        elif remaining() < img_est + 15.0:
            FIELDS["img_skipped_for_budget"] = round(remaining(), 1)
        else:
            try:
                tis = time.time()
                stage_image()
                hist["img_total_s"] = round(time.time() - tis, 1)
            except BenchNumericError as e:
                FIELDS["img_numeric_failure"] = str(e)[:200]
                _EXIT_CODE = 2
            except (RuntimeError, OSError) as e:
                FIELDS["img_error"] = f"{type(e).__name__}: {e}"[:200]
    except BenchNumericError as e:
        FIELDS["numeric_failure"] = str(e)[:200]
        _EXIT_CODE = 2
    finally:
        _save_stage_times(hist)
        emit()
    sys.exit(_EXIT_CODE)


if __name__ == "__main__":
    main()
