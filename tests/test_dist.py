"""Distributed-path tests on the emulated 8-device CPU mesh.

The SURVEY §4 pattern: same-program N=1 vs N=k equivalence without a
cluster.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from xivo_tpu.ba import solve
from xivo_tpu.dist import (make_distributed_solver, make_sharded_matcher,
                           shard_problem)
from tests.test_ba import make_problem


def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    return Mesh(np.asarray(devs[:8]), ("data",))


def test_distributed_ba_matches_single_device():
    mesh = mesh8()
    p, (Rs, Ts, Xs) = make_problem(K=8, Lm=64, perturb=0.05)
    p_single, chi_single = solve(p, iters=8, damping=1e-5)

    solver = make_distributed_solver(mesh, iters=8, damping=1e-5)
    p_sh = shard_problem(p, mesh)
    p_dist, chi_dist = solver(p_sh)

    assert np.allclose(np.asarray(p_dist.Ts), np.asarray(p_single.Ts),
                       atol=1e-8)
    assert np.allclose(np.asarray(p_dist.Xs), np.asarray(p_single.Xs),
                       atol=1e-8)
    assert np.allclose(np.asarray(chi_dist), np.asarray(chi_single),
                       rtol=1e-8)


def test_sharded_retrieval_matches_bruteforce():
    mesh = mesh8()
    rng = np.random.default_rng(0)
    M, F = 1024, 16
    mdesc = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    qdesc = jnp.asarray(rng.integers(0, 2 ** 32, (F, 8), dtype=np.uint32))
    # plant exact matches for half the queries
    qdesc = qdesc.at[:8].set(mdesc[100:108])
    mvalid = jnp.ones((M,), bool)

    from xivo_tpu.frontend import brief
    D = np.asarray(brief.hamming_matrix(qdesc, mdesc))
    nn_ref = D.argmin(axis=1)
    d_ref = D.min(axis=1)

    matcher = make_sharded_matcher(mesh)
    nn, dist = matcher(qdesc, mdesc, mvalid)
    assert np.array_equal(np.asarray(dist), d_ref)
    # plant-match indices must agree exactly; ties elsewhere may differ
    assert np.array_equal(np.asarray(nn)[:8], nn_ref[:8])
    assert np.all(np.asarray(dist)[:8] == 0)


@pytest.mark.slow
def test_multi_sequence_sharded_runner():
    """The data-parallel filter scan over the mesh (dryrun path)."""
    mesh = mesh8()
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
