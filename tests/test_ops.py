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
