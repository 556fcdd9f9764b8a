"""TPU equivalence check: fused-Pallas LK vs the pure-jnp path.

Runs `track()` on rendered imagery both ways on the device and
compares positions/validity. The kernel implements the identical
done-masked GN recursion, so agreement should be near machine level
(tiny drift only from f32 op-reassociation).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import xivo_tpu.frontend.lk as LK
    from xivo_tpu.frontend.image import build_pyramid
    from scripts.bench_image import build_frames

    frames, cfg, imu = build_frames()
    img0 = np.asarray(frames[30][4])
    img1 = np.asarray(frames[31][4])
    pyr0 = build_pyramid(jnp.asarray(img0, jnp.float32), 4)
    pyr1 = build_pyramid(jnp.asarray(img1, jnp.float32), 4)

    rng = np.random.default_rng(0)
    N = 128
    pts = jnp.asarray(
        rng.uniform(40, 470, (N, 2)).astype(np.float32))
    guesses = pts + jnp.asarray(
        rng.uniform(-3, 3, (N, 2)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=N) < 0.7)

    kw = dict(win_size=15, iters=15, eps=0.01, pad=8)

    LK._FORCE_JNP = True
    p_ref, ok_ref = jax.jit(
        lambda *a: LK.track(list(pyr0), list(pyr1), *a, **kw))(
            pts, guesses, valid)
    p_ref, ok_ref = np.asarray(p_ref), np.asarray(ok_ref)

    LK._FORCE_JNP = False
    p_k, ok_k = jax.jit(
        lambda *a: LK.track(list(pyr0), list(pyr1), *a, **kw))(
            pts, guesses, valid)
    p_k, ok_k = np.asarray(p_k), np.asarray(ok_k)

    both = ok_ref & ok_k
    d = np.linalg.norm(p_ref - p_k, axis=1)
    print(f"valid agree: {np.mean(ok_ref == ok_k):.4f} "
          f"({int((ok_ref != ok_k).sum())} differ of {N})")
    print(f"pos |d| on joint-ok: max={d[both].max():.5f} "
          f"median={np.median(d[both]):.6f}")
    # batched (vmap) path
    B = 4
    pb = jnp.broadcast_to(pts, (B, N, 2))
    gb = jnp.broadcast_to(guesses, (B, N, 2))
    vb = jnp.broadcast_to(valid, (B, N))
    pyr0b = [jnp.broadcast_to(p, (B,) + p.shape) for p in pyr0]
    pyr1b = [jnp.broadcast_to(p, (B,) + p.shape) for p in pyr1]
    f = jax.jit(jax.vmap(lambda p0, p1, pt, gu, va: LK.track(
        list(p0), list(p1), pt, gu, va, **kw),
        in_axes=(0, 0, 0, 0, 0)))
    pv, okv = f(tuple(pyr0b), tuple(pyr1b), pb, gb, vb)
    dv = np.linalg.norm(np.asarray(pv[0]) - p_k, axis=1)
    print(f"vmap-vs-single max |d| = {dv[np.asarray(okv[0]) & ok_k].max():.6f}")
    assert np.mean(ok_ref == ok_k) > 0.97
    assert d[both].max() < 0.05
    print("LK kernel equivalence OK")


if __name__ == "__main__":
    main()
