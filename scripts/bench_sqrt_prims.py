"""Microbenchmark of square-root-filter primitives on TPU.

Decides the recompression strategy for the factored-covariance filter
(VERDICT r1 #1): per-frame QR of the augmented factor vs. Gram+Cholesky,
and the measurement-update downdate: sequential per-feature scan vs.
batched eigh. Shapes follow the PCW bench: D ~ error-state size,
B = batch of independent sequences.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D = int(os.environ.get("D", "228"))
C = int(os.environ.get("C", "60"))      # slack columns consumed per frame
B = int(os.environ.get("B", "256"))
M = int(os.environ.get("M", "60"))      # measurement rows (2*n_features)
F = M // 2

key = jax.random.PRNGKey(0)
S = jax.random.normal(key, (B, D, D + C), jnp.float32) * 0.1
H = jax.random.normal(key, (B, M, D + C), jnp.float32) * 0.01
inn = jax.random.normal(key, (B, M), jnp.float32)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms/frame-batch")
    return dt


@jax.jit
def recomp_qr(S):
    def one(s):
        r = jnp.linalg.qr(s.T, mode="r")
        return r.T
    return jax.vmap(one)(S)


@jax.jit
def recomp_chol(S):
    def one(s):
        P = s @ s.T
        P = P + 1e-12 * jnp.eye(D)
        return jnp.linalg.cholesky(P)
    return jax.vmap(one)(S)


@jax.jit
def downdate_seq(S, H, inn):
    """Sequential per-feature (2-row) closed-form factor downdate."""
    def one(s, h, r):
        def step(carry, blk):
            s, delta = carry
            Hi, ri = blk                      # (2, D+C), (2,)
            V = Hi @ s.T                       # (2, D+C) x (D+C, D)->(2,D)? no
            return carry, 0.0
        # real math: V = Hi @ S^T? S is (D, D+C); rows of H over state dims
        def step2(carry, blk):
            s, delta = carry
            Hi, ri = blk
            V = Hi[:, :s.shape[0]] @ s            # (2, D+C)
            Sinn = V @ V.T + jnp.eye(2)
            L = jnp.linalg.cholesky(Sinn)
            Li = jnp.linalg.inv(L)
            Bm = V.T @ Li.T                        # (D+C, 2)
            N = Bm.T @ Bm
            # sqrtm of 2x2 SPD: (A + sqrt(det) I)/sqrt(tr + 2 sqrt(det))
            A = jnp.eye(2) - N
            det = jnp.clip(A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0], 0.0)
            sq = jnp.sqrt(det)
            Asq = (A + sq * jnp.eye(2)) / jnp.sqrt(A[0, 0] + A[1, 1] + 2 * sq)
            G = jnp.linalg.inv(jnp.eye(2) + Asq)
            SB = s @ Bm                            # (D, 2)
            s = s - SB @ (G @ Bm.T)
            r2 = ri - Hi[:, :s.shape[0]] @ delta[:s.shape[0]]
            K = SB @ Li
            delta = delta + jnp.concatenate([K @ jnp.linalg.solve(L, r2),
                                             jnp.zeros(0)])[:delta.shape[0]] * 0 \
            + (s[:, :2] * 0).sum() * 0
            return (s, delta), 0.0
        Hb = h.reshape(F, 2, -1)
        rb = r.reshape(F, 2)
        (s, delta), _ = jax.lax.scan(step2, (s, jnp.zeros(s.shape[0])), (Hb, rb))
        return s
    return jax.vmap(one)(S, H, inn)


@jax.jit
def downdate_batch_eigh(S, H, inn):
    def one(s, h, r):
        V = h[:, :D] @ s                        # (M, D+C)
        Sinn = V @ V.T + jnp.eye(M)
        L = jnp.linalg.cholesky(Sinn)
        Bm = jax.scipy.linalg.solve_triangular(L, V, lower=True).T  # (D+C, M)
        N = Bm.T @ Bm
        w, Q = jnp.linalg.eigh(jnp.eye(M) - N)
        sq = Q @ (jnp.sqrt(jnp.clip(w, 0.0))[:, None] * Q.T)
        G = jnp.linalg.inv(jnp.eye(M) + sq)
        return s - (s @ Bm) @ (G @ Bm.T)
    return jax.vmap(one)(S, H, inn)


@jax.jit
def joseph_ref(S, H, inn):
    """Current Joseph update as the cost reference (P-form)."""
    def one(s, h, r):
        P = s[:, :D] @ s[:, :D].T
        HP = h[:, :D] @ P
        Sm = HP @ h[:, :D].T + jnp.eye(M)
        c = jax.scipy.linalg.cho_factor(Sm, lower=True)
        Kt = jax.scipy.linalg.cho_solve(c, HP)
        K = Kt.T
        IKH = K @ h[:, :D] - jnp.eye(D)
        return IKH @ P @ IKH.T + K @ K.T
    return jax.vmap(one)(S, H, inn)


print(f"D={D} C={C} B={B} M={M} dev={jax.devices()[0]}")
timeit("recompress QR (D+C)->D", recomp_qr, S)
timeit("recompress Gram+chol", recomp_chol, S)
timeit("downdate seq scan (F blocks)", downdate_seq, S, H, inn)
timeit("downdate batch eigh (MxM)", downdate_batch_eigh, S, H, inn)
timeit("joseph P-form (reference)", joseph_ref, S, H, inn)
