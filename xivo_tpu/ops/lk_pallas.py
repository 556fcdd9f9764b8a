"""Fused pyramidal-LK iteration kernels (Pallas, lanes-batch layout).

The batched image profile (scripts/profile_image.py, round 3) put 80%
of the frame in LK, and inside it every bilinear window sample cost
~0.25 ms/call regardless of formulation (2-hot matmuls, static-shift
sums, lanes layout) — each jnp call materializes its intermediates
through HBM. These kernels keep the per-track patches resident in VMEM
and run the ENTIRE Gauss-Newton iteration loop in one pallas_call:
measured 75 us per iteration for 2048 tracks (vs 245 us), i.e. a full
15-iteration level in ~1.1 ms.

Layout: track-in-LANES. Patches are (S, S, BN), per-track scalars
(1, BN); every elementwise op vectorizes across the full track batch.
The window sample is the static-shift formulation (frontend/lk.py
docstring): out = sum_o c_o * patch[o:o+w] per axis, with the bilinear
fractions folded into the 2-hot offset coefficients — inside the
kernel the 17-term sums stay in VMEM registers.

The jnp fallback (identical math) remains the CPU/x64 path in
frontend/lk.py; these kernels engage on TPU float32 only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _coeffs(b, f, no, Bl):
    """(no, 1, Bl) 2-hot offset coefficients with folded fraction."""
    o = jax.lax.broadcasted_iota(jnp.int32, (no, 1, Bl), 0).astype(
        jnp.float32)
    return jnp.where(o == b[None], (1.0 - f)[None],
                     jnp.where(o == b[None] + 1.0, f[None], 0.0))


def _sample(p_ref, sx, sy, S: int, w: int, Bl: int):
    """Bilinear (w, w, Bl) window at continuous top-left (sx, sy),
    each (1, Bl). Static-shift sums over the S-w+1 integer offsets."""
    no = S - w + 1
    sxc = jnp.clip(sx, 0.0, S - w - 1 + 0.999)
    syc = jnp.clip(sy, 0.0, S - w - 1 + 0.999)
    bx = jnp.floor(sxc)
    by = jnp.floor(syc)
    cy = _coeffs(by, syc - by, no, Bl)
    cx = _coeffs(bx, sxc - bx, no, Bl)
    Pr = cy[0] * p_ref[0:w, :, :]
    for i in range(1, no):
        Pr = Pr + cy[i] * p_ref[i:i + w, :, :]
    I = cx[0] * Pr[:, 0:w, :]
    for j in range(1, no):
        I = I + cx[j] * Pr[:, j:j + w, :]
    return I


def _gn_kernel(sp_ref, t_ref, gx_ref, gy_ref, sc_ref, pt_ref, st_ref,
               out_pt_ref, out_st_ref, *, S: int, w: int, iters: int):
    """Full GN iteration loop for one lane block.

    sc_ref: (9, Bl) scalars — gxx, gxy, gyy, det, lo_x, lo_y, hi_x,
    hi_y, eps^2. pt_ref/st_ref: (2, Bl) iterate (x, y) and state (done,
    escaped) as 0/1 floats. The iterate is in PATCH coordinates
    (caller subtracts sorig); clamp bounds likewise.
    """
    Bl = sp_ref.shape[2]
    gxx = sc_ref[0:1, :]
    gxy = sc_ref[1:2, :]
    gyy = sc_ref[2:3, :]
    det = sc_ref[3:4, :]
    lox = sc_ref[4:5, :]
    loy = sc_ref[5:6, :]
    hix = sc_ref[6:7, :]
    hiy = sc_ref[7:8, :]
    ptx = pt_ref[0:1, :]
    pty = pt_ref[1:2, :]
    done = st_ref[0:1, :]
    esc = st_ref[1:2, :]
    eps2 = sc_ref[8:9, :]          # squared eps, per track (uniform)

    for _ in range(iters):
        I = _sample(sp_ref, ptx - w // 2, pty - w // 2, S, w, Bl)
        r = I - t_ref[:]
        bxv = jnp.sum(gx_ref[:] * r, axis=(0, 1))[None, :]
        byv = jnp.sum(gy_ref[:] * r, axis=(0, 1))[None, :]
        dx = (gyy * bxv - gxy * byv) / det
        dy = (gxx * byv - gxy * bxv) / det
        small = (dx * dx + dy * dy < eps2).astype(jnp.float32)
        rawx = ptx - dx
        rawy = pty - dy
        cx_ = jnp.minimum(jnp.maximum(rawx, lox), hix)
        cy_ = jnp.minimum(jnp.maximum(rawy, loy), hiy)
        hit = ((rawx != cx_) | (rawy != cy_)).astype(jnp.float32)
        ptx = done * ptx + (1.0 - done) * cx_
        pty = done * pty + (1.0 - done) * cy_
        esc = jnp.maximum(esc, hit * (1.0 - done))
        done = jnp.maximum(done, jnp.maximum(small, hit))
    out_pt_ref[0:1, :] = ptx
    out_pt_ref[1:2, :] = pty
    out_st_ref[0:1, :] = done
    out_st_ref[1:2, :] = esc


def _tmpl_kernel(tp_ref, gxp_ref, gyp_ref, pos_ref, t_ref, gx_ref,
                 gy_ref, *, S: int, w: int):
    """Template sampling: T/Gx/Gy windows at one shared position —
    coefficients computed once, three slab passes."""
    Bl = tp_ref.shape[2]
    sx = pos_ref[0:1, :]
    sy = pos_ref[1:2, :]
    t_ref[:] = _sample(tp_ref, sx, sy, S, w, Bl)
    gx_ref[:] = _sample(gxp_ref, sx, sy, S, w, Bl)
    gy_ref[:] = _sample(gyp_ref, sx, sy, S, w, Bl)


def _pad_bn(x, Bl):
    BN = x.shape[-1]
    BNp = int(np.ceil(BN / Bl) * Bl)
    if BNp != BN:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, BNp - BN)]
        x = jnp.pad(x, pad)
    return x, BNp


@functools.partial(jax.jit, static_argnames=("S", "w", "iters",
                                             "lane_block"))
def lk_gn_loop(sp, T, Gx, Gy, scalars, pt0, st0, *, S: int, w: int,
               iters: int, lane_block: int = 512):
    """Run the full LK GN loop on TPU.

    sp (S, S, BN); T/Gx/Gy (w, w, BN); scalars (9, BN) = gxx, gxy,
    gyy, det, lo_x, lo_y, hi_x, hi_y, eps^2; pt0 (2, BN) patch-coord
    iterate; st0 (2, BN) float done/escaped. Returns (pt, st).
    """
    BN = sp.shape[-1]
    Bl = min(lane_block, max(128, BN))
    Bl = max(128, (Bl // 128) * 128)
    args = [_pad_bn(x, Bl)[0] for x in (sp, T, Gx, Gy, scalars, pt0,
                                        st0)]
    BNp = args[0].shape[-1]
    spec = lambda *shape: pl.BlockSpec(tuple(shape) + (Bl,),
                                       lambda i: tuple([0] * len(shape))
                                       + (i,),
                                       memory_space=pltpu.VMEM)
    pt, st = pl.pallas_call(
        functools.partial(_gn_kernel, S=S, w=w, iters=iters),
        out_shape=(jax.ShapeDtypeStruct((2, BNp), jnp.float32),
                   jax.ShapeDtypeStruct((2, BNp), jnp.float32)),
        grid=(BNp // Bl,),
        in_specs=[spec(S, S), spec(w, w), spec(w, w), spec(w, w),
                  spec(9), spec(2), spec(2)],
        out_specs=(spec(2), spec(2)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return pt[:, :BN], st[:, :BN]


@functools.partial(jax.jit, static_argnames=("S", "w", "lane_block"))
def lk_sample_templates(tp, gxp, gyp, pos, *, S: int, w: int,
                        lane_block: int = 512):
    """T/Gx/Gy windows at a shared per-track position, one kernel."""
    BN = tp.shape[-1]
    Bl = min(lane_block, max(128, BN))
    Bl = max(128, (Bl // 128) * 128)
    args = [_pad_bn(x, Bl)[0] for x in (tp, gxp, gyp, pos)]
    BNp = args[0].shape[-1]
    spec = lambda *shape: pl.BlockSpec(tuple(shape) + (Bl,),
                                       lambda i: tuple([0] * len(shape))
                                       + (i,),
                                       memory_space=pltpu.VMEM)
    T, Gx, Gy = pl.pallas_call(
        functools.partial(_tmpl_kernel, S=S, w=w),
        out_shape=(jax.ShapeDtypeStruct((w, w, BNp), jnp.float32),) * 3,
        grid=(BNp // Bl,),
        in_specs=[spec(S, S), spec(S, S), spec(S, S), spec(2)],
        out_specs=(spec(w, w),) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return T[..., :BN], Gx[..., :BN], Gy[..., :BN]


# ---------------------------------------------------------------------------
# track-leading wrappers with CUSTOM VMAP: the frontend works in
# (N, ...) per-stream arrays under a vmap over streams; the batching
# rule flattens (B, N) into one lane axis so the whole batch reaches
# ONE kernel dispatch per call site.
# ---------------------------------------------------------------------------

def _tl(x):
    """(N, ...) -> (..., N)."""
    return jnp.moveaxis(x, 0, -1)


def _fl(x):
    """(B, N, ...) -> (..., B*N)."""
    x = jnp.moveaxis(x, (0, 1), (-2, -1))
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _unfl(x, B):
    """(k, B*N) -> (B, N, k)."""
    k, BN = x.shape
    return jnp.moveaxis(x.reshape(k, B, BN // B), 0, -1)


@functools.lru_cache(maxsize=None)
def gn_tracks_fn(S: int, w: int, iters: int):
    """(custom-vmap) GN loop over a track table.

    f(sp (N,S,S), T (N,w,w), Gx, Gy, sc (N,9), pt (N,2), st (N,2))
    -> (pt (N,2), st (N,2))
    """

    @jax.custom_batching.custom_vmap
    def f(sp, T, Gx, Gy, sc, pt, st):
        out_pt, out_st = lk_gn_loop(
            _tl(sp), _tl(T), _tl(Gx), _tl(Gy), sc.T, pt.T, st.T,
            S=S, w=w, iters=iters)
        return out_pt.T, out_st.T

    @f.def_vmap
    def _f_vmap(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a[None],
                                             (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        sp, T, Gx, Gy, sc, pt, st = args
        out_pt, out_st = lk_gn_loop(
            _fl(sp), _fl(T), _fl(Gx), _fl(Gy), _fl(sc), _fl(pt),
            _fl(st), S=S, w=w, iters=iters)
        return (_unfl(out_pt, axis_size), _unfl(out_st, axis_size)), \
            (True, True)

    return f


@functools.lru_cache(maxsize=None)
def sample_templates_fn(S: int, w: int):
    """(custom-vmap) T/Gx/Gy template windows at a shared position.

    f(tp (N,S,S), gxp, gyp, pos (N,2)) -> (T, Gx, Gy) each (N,w,w)
    """

    @jax.custom_batching.custom_vmap
    def f(tp, gxp, gyp, pos):
        T, Gx, Gy = lk_sample_templates(_tl(tp), _tl(gxp), _tl(gyp),
                                        pos.T, S=S, w=w)
        # (w, w, N) -> (N, w, w)
        return tuple(jnp.moveaxis(x, -1, 0) for x in (T, Gx, Gy))

    @f.def_vmap
    def _f_vmap(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a[None],
                                             (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        tp, gxp, gyp, pos = args
        T, Gx, Gy = lk_sample_templates(_fl(tp), _fl(gxp), _fl(gyp),
                                        _fl(pos), S=S, w=w)

        def back(x):
            # (w, w, B*N) -> (B, N, w, w)
            ww, ww2, BN = x.shape
            return jnp.moveaxis(
                x.reshape(ww, ww2, axis_size, BN // axis_size),
                (0, 1), (-2, -1))

        return (back(T), back(Gx), back(Gy)), (True, True, True)

    return f
