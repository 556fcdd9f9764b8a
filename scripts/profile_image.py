"""Image-path phase ablations at batch (VERDICT r2 weak #2).

Times the batched (B streams) image VIO scan with surgical ablations of
each pipeline phase — LK, detection+NMS+topk, descriptor extraction,
filter update — to locate where the batch-16 wall-clock goes. Shapes
and dataflow are preserved (outputs consumed by the scan carry), so
timing stays honest while numerics go wrong under ablation.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "16"))


def run_variant(name, patch, cfg_overrides=None, mod=None):
    import dataclasses

    import xivo_tpu.frontend.tracker as TRK
    from scripts.bench_image import build_frames
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.frontend import init_frontend, vio_frame_image

    mod = mod or TRK
    saved = {}
    for attr, fn in (patch or {}).items():
        saved[attr] = getattr(mod, attr)
        setattr(mod, attr, fn)
    try:
        frames, cfg, imu = build_frames()
        if cfg_overrides:
            cfg = dataclasses.replace(cfg, **cfg_overrides)
        rest = frames[20:60]
        packed = tuple(jnp.stack([f[i] for f in rest]) for i in range(5))
        s = init_state(cfg)
        a0, g0 = imu.meas(0.0)
        s = s._replace(last_gyro=jnp.asarray(g0, np.float32),
                       last_accel=jnp.asarray(a0, np.float32))
        fes = init_frontend(cfg)

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
            lambda x: jnp.broadcast_to(
                x[:, None], (x.shape[0], B) + x.shape[1:]), packed)
        sb = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), s)
        fb = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), fes)
        Tsb = runb(sb, fb, packed_b)
        jax.block_until_ready(Tsb)
        t0 = time.perf_counter()
        Tsb = runb(sb, fb, packed_b)
        jax.block_until_ready(Tsb)
        wall = time.perf_counter() - t0
        n = len(rest)
        print(f"{name:18s} {n * B / wall:8.1f} f/s/chip "
              f"{wall / n * 1e3:7.2f} ms/frame-batch", flush=True)
    finally:
        for attr, fn in saved.items():
            setattr(TRK, attr, fn)


def main():
    import xivo_tpu.frontend.tracker as TRK

    def no_track(prev_pyr, next_pyr, pts, guesses, valid, **kw):
        g = guesses + 1e-12 * prev_pyr[0][0, 0] + 1e-12 * next_pyr[0][0, 0]
        return g, valid

    def no_detect(cfg, img):
        return jnp.zeros_like(img) + 1e-12 * img

    def no_update(cfg, s):
        from xivo_tpu.filter.pipeline import StepOutputs
        z = jnp.zeros((), jnp.int32)
        out = StepOutputs(
            Rsb=s.X.Rsb, Tsb=s.X.Tsb + 1e-12 * jnp.sum(s.P[:1, :1]),
            Vsb=s.X.Vsb, num_instate_features=z, num_instate_groups=z,
            num_tracked=z, num_mh_rejected=z,
            num_oneptransac_rejected=z,
            num_tracker_outlier_rejected=z,
            inn_rms=jnp.zeros((), s.P.dtype),
            num_oos_dropped=z)
        return s, out

    variants = [
        ("full", None, None),
        ("no-lk", {"track": no_track}, None),
        ("no-detect", {"_detect_score": no_detect}, None),
        ("no-update", {"update_step": no_update}, None),
        ("iters8", None, {"klt_max_iter": 8}),
        ("iters15", None, {"klt_max_iter": 15}),
        ("levels4", None, {"klt_max_level": 4}),
        ("lev4-it15", None, {"klt_max_level": 4, "klt_max_iter": 15}),
    ]
    only = os.environ.get("ONLY")
    sel = [t.strip() for t in only.split(",")] if only else None
    for name, patch, ov in variants:
        if sel and not any(t in name for t in sel):
            continue
        run_variant(name, patch, ov)


if __name__ == "__main__":
    main()
