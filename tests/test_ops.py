"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from xivo_tpu.frontend import brief
from xivo_tpu.ops.hamming_pallas import hamming_nn


def test_hamming_nn_matches_bruteforce():
    rng = np.random.default_rng(0)
    M, F = 3000, 30
    md = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    qd = jnp.asarray(rng.integers(0, 2 ** 32, (F, 8), dtype=np.uint32))
    qd = qd.at[:5].set(md[1000:1005])
    mv = jnp.ones((M,), bool).at[2000:].set(False)

    D = np.array(brief.hamming_matrix(qd, md))
    D[:, 2000:] = 10_000
    d, i = hamming_nn(qd, md, mv, interpret=True)
    assert np.array_equal(np.asarray(d), D.min(axis=1))
    assert np.array_equal(np.asarray(i)[:5], np.arange(1000, 1005))
    # every returned index achieves the returned distance
    for k in range(F):
        assert D[k, int(i[k])] == int(d[k])


def test_lanes_chol_lane_block_sizing():
    """Advisor r3 #2: the lanes kernels must auto-shrink their lane
    block so the (m, m, Bl) VMEM buffers fit, and fall back to XLA when
    even Bl=128 cannot fit (m=228 at Bl=256 with two buffers is ~106 MB
    against the 100 MB cap)."""
    from xivo_tpu.ops.lanes_chol import _safe_lane_block, _VMEM_BUDGET

    # small innovation factors keep the requested block
    assert _safe_lane_block(60, 256, n_bufs=2) == 256
    # OOS stack m=216, two buffers: 256 lanes exceed budget -> 128
    assert _safe_lane_block(216, 256, n_bufs=2) == 128
    # recompression m=228 single aliased buffer still fits at 256
    assert _safe_lane_block(228, 256, n_bufs=1) == 256
    assert _safe_lane_block(228, 256, n_bufs=2) == 128
    # beyond any fit: signal fallback
    assert _safe_lane_block(1000, 256, n_bufs=2) == 0
    # returned block always fits the budget
    for m in (8, 60, 128, 216, 228, 320):
        for nb in (1, 2):
            bl = _safe_lane_block(m, 256, nb)
            if bl:
                assert nb * m * m * bl * 4 <= _VMEM_BUDGET
                assert bl % 128 == 0


def test_lanes_chol_fallback_large_m():
    """m past the VMEM wall routes to the masked XLA fallback and still
    honors dead-row semantics."""
    from xivo_tpu.ops.lanes_chol import chol_lanes, chol_inv_lanes

    rng = np.random.default_rng(3)
    m = 40
    A = rng.standard_normal((2, m, m)).astype(np.float32)
    G = np.einsum("bij,bkj->bik", A, A) + 3 * np.eye(m, dtype=np.float32)
    G[:, 7, :] = 0.0
    G[:, :, 7] = 0.0
    L, Li = chol_inv_lanes(jnp.asarray(G))
    L, Li = np.asarray(L), np.asarray(Li)
    # L L^T reproduces G on the live subspace; dead row/col exactly zero
    assert np.allclose(L @ np.swapaxes(L, 1, 2), G, atol=1e-3)
    assert np.all(L[:, 7, :] == 0) and np.all(Li[:, 7, :] == 0)
    LLi = Li @ L
    live = np.ones(m, bool)
    live[7] = False
    eye = np.eye(m, dtype=np.float32)[live][:, live]
    assert np.allclose(LLi[:, live][:, :, live], eye, atol=1e-3)
    Lo = np.asarray(chol_lanes(jnp.asarray(G)))
    assert np.allclose(Lo, L, atol=1e-5)
