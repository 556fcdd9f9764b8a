"""Scan-timed image-path phase profile at batch B on TPU.

The round-1 finding: batch-16 image VIO reaches only ~1.7x a single
stream. Phases are isolated with live consumers inside a lax.scan (the
ONLY measurement that is real through the axon relay — see
ARCHITECTURE.md round-2 notes). Run: python scripts/profile_image.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("IMG_BATCH", "16"))
REPS = 20

from bench_image import build_frames
from xivo_tpu.filter.state import init_state
from xivo_tpu.frontend import init_frontend, vio_frame_image
from xivo_tpu.frontend.tracker import tracker_image
from xivo_tpu.frontend import image as im
from xivo_tpu.frontend import lk as lk_mod
from xivo_tpu.filter.pipeline import propagate_frame, update_step

frames, cfg, imu = build_frames()
rest = frames[20:60]
packed = tuple(jnp.stack([f[i] for f in rest]) for i in range(5))

s = init_state(cfg)
a0, g0 = imu.meas(0.0)
s = s._replace(last_gyro=jnp.asarray(g0, np.float32),
               last_accel=jnp.asarray(a0, np.float32))
fes = init_frontend(cfg)

# load the filter: run 20 frames single-stream
step1 = jax.jit(partial(vio_frame_image, cfg))
for f in frames[:20]:
    s, fes, _ = step1(s, fes, *[jnp.asarray(x) for x in f])

sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), s)
fb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), fes)
inp = jax.tree.map(lambda x: jnp.broadcast_to(x[5], (B,) + x.shape[1:]),
                   packed)
gy, ac, dts, fdt, img = inp


def timeit(name, fn, *args):
    @jax.jit
    def loop(carry):
        def body(c, _):
            out = jax.vmap(fn)(c, *args)
            return out, None
        out, _ = jax.lax.scan(body, carry, None, length=REPS)
        return sum(jnp.sum(l[:1].astype(jnp.float32))
                   for l in jax.tree.leaves(out))
    float(loop(sb))
    t0 = time.perf_counter()
    float(loop(sb))
    wall = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:34s} {wall:8.3f} ms/frame-batch "
          f"({wall / B * 1e3:8.1f} us/stream)")
    return wall


def ph_propagate(s, gy, ac, dts, fdt):
    return propagate_frame(cfg, s, gy, ac, dts, fdt)


def ph_pyramid(s, img):
    pyr = im.build_pyramid(img + s.init_z * 1e-12, cfg.klt_max_level)
    fr = s.features
    fr = fr._replace(xp=fr.xp + 1e-12 * sum(jnp.mean(p) for p in pyr))
    return s._replace(features=fr)


def ph_tracker(s, img):
    s2, _ = tracker_image(cfg, s, jax.tree.map(lambda x: x, _fes_of(s)),
                          img)
    return s2


_fes_template = fb


def _fes_of(s):
    # borrow a static frontend state (previous pyramid) per stream
    return jax.tree.map(lambda x: x[0], _fes_template)


def ph_update(s):
    s2, _ = update_step(cfg, s)
    return s2


def ph_full(s, gy, ac, dts, fdt, img):
    fes0 = _fes_of(s)
    s2, _, _ = vio_frame_image(cfg, s, fes0, gy, ac, dts, fdt, img)
    return s2


print(f"B={B} image {img.shape[1]}x{img.shape[2]} "
      f"tracks={cfg.dims.nf_rows} dev={jax.devices()[0]}")
timeit("propagate", ph_propagate, gy, ac, dts, fdt)
timeit("pyramid build", ph_pyramid, img)
timeit("tracker (LK+detect+desc)", ph_tracker, img)
timeit("update_step", ph_update)
timeit("FULL vio_frame_image", ph_full, gy, ac, dts, fdt, img)


def ph_lk(s, img):
    pyr_new = tuple(im.build_pyramid(img.astype(jnp.float32),
                                     cfg.klt_max_level))
    fes0 = _fes_of(s)
    new_xy, ok = lk_mod.track(list(fes0.pyr), list(pyr_new),
                              s.features.xp, s.features.xp,
                              s.features.active,
                              win_size=cfg.klt_win_size,
                              iters=cfg.klt_max_iter, eps=cfg.klt_eps)
    # loop-carry the result through the track positions so XLA cannot
    # hoist the computation out of the timing scan
    fr = s.features
    fr = fr._replace(xp=fr.xp + 1e-12 * new_xy
                     + 1e-12 * ok[:, None].astype(fr.xp.dtype))
    return s._replace(features=fr)


def ph_detect(s, img):
    from xivo_tpu.frontend.fast import fast_score, nms3, select_topk
    from xivo_tpu.frontend.image import blur5
    from xivo_tpu.frontend.descriptors import KINDS, extract as dex
    score = nms3(fast_score(img.astype(jnp.float32), cfg.fast_threshold))
    det_xy, det_score, det_ok = select_topk(
        score, 64, cfg.margin, s.features.xp, s.features.active,
        cfg.mask_size)
    sm = blur5(img.astype(jnp.float32))
    descs = jax.vmap(lambda p: dex(KINDS[cfg.descriptor_type], sm, p))(
        det_xy)
    fr = s.features
    fr = fr._replace(xp=fr.xp + 1e-12 * (
        jnp.sum(det_xy) + jnp.sum(det_score)
        + jnp.sum(descs.astype(jnp.float32))))
    return s._replace(features=fr)


timeit("LK track only", ph_lk, img)
timeit("detect+topk+desc", ph_detect, img)
