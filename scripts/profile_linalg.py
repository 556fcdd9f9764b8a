"""Standalone-ish primitive timings on TPU (scan-chained so nothing is
dead-code-eliminated and dispatches are data-dependent).

Times, per call at batch B: XLA cholesky at m=60 / D=228, XLA
triangular_solve at the sqrt_update shapes, the current Pallas
cholesky_batched at D=228, and the Gram matmul at (D, D+C).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "256"))
N_ITER = 50


def timeit(name, build):
    """build() -> (init_carry, step_fn). step: carry -> carry, chained."""
    carry0, step = build()

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=N_ITER)
        return c
    c = run(carry0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(c)
    jax.block_until_ready(c)
    wall = (time.perf_counter() - t0) / N_ITER * 1e3
    print(f"{name:42s} {wall:8.3f} ms/call", flush=True)


def main():
    rng = np.random.default_rng(0)

    def psd(m):
        A = rng.standard_normal((B, m, m)).astype(np.float32)
        return jnp.asarray(A @ A.transpose(0, 2, 1) + 3 * np.eye(m,
                           dtype=np.float32))

    G60 = psd(60)
    G228 = psd(228)
    V = jnp.asarray(rng.standard_normal((B, 60, 357)).astype(np.float32))
    S = jnp.asarray(rng.standard_normal((B, 228, 357)).astype(np.float32))

    def chain(x, out):
        # tiny data dependence: feed a scalar of the result back in
        return x * (1.0 + 1e-12 * jnp.mean(out))

    timeit("xla chol(60)", lambda: (
        G60, lambda c: chain(c, jnp.linalg.cholesky(c))))
    timeit("xla chol(228)", lambda: (
        G228, lambda c: chain(c, jnp.linalg.cholesky(c))))

    from xivo_tpu.ops.chol_pallas import cholesky_batched
    timeit("pallas chol(228) [current]", lambda: (
        G228, lambda c: chain(c, cholesky_batched(c))))
    timeit("pallas chol(60)  [current]", lambda: (
        G60, lambda c: chain(c, cholesky_batched(c))))

    L60 = jnp.linalg.cholesky(G60)
    timeit("tri_solve(60, 418rhs)", lambda: (
        V, lambda c: chain(c, jax.scipy.linalg.solve_triangular(
            L60, jnp.pad(c, ((0, 0), (0, 0), (0, 61))), lower=True))))
    timeit("tri_solve(60, 60rhs)", lambda: (
        V, lambda c: chain(c, jax.scipy.linalg.solve_triangular(
            L60, c[:, :, :60], lower=True))))

    timeit("gram 228x357 HIGHEST", lambda: (
        S, lambda c: chain(c, jnp.einsum(
            "bik,bjk->bij", c, c, precision=jax.lax.Precision.HIGHEST))))
    timeit("gram 228x357 default-f32", lambda: (
        S, lambda c: chain(c, jnp.einsum(
            "bik,bjk->bij", c, c,
            preferred_element_type=jnp.float32))))
    timeit("matmul 60x60 @ 60x357", lambda: (
        V, lambda c: chain(c, jnp.einsum(
            "bij,bjk->bik", L60, c,
            precision=jax.lax.Precision.HIGHEST))))


if __name__ == "__main__":
    main()
