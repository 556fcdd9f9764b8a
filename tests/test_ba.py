"""Bundle-adjustment tests: synthetic problem, noise-perturbed init,
convergence to ground truth up to the gauge."""
import jax
import jax.numpy as jnp
import numpy as np

from xivo_tpu.ba import BAProblem, solve
from xivo_tpu.geom import so3


def make_problem(K=8, Lm=60, noise_px=0.0, perturb=0.05, seed=0,
                 dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    # cameras on an arc looking at a cloud around the origin, z-forward
    Rs, Ts = [], []
    for k in range(K):
        ang = 0.15 * k
        T = np.array([2.0 * np.sin(ang), 0.3 * k / K, -8.0])
        w = np.array([0.02 * k, 0.1 * np.sin(ang), 0.01 * k])
        Rs.append(np.asarray(so3.exp(jnp.asarray(w))))
        Ts.append(T)
    Rs, Ts = np.asarray(Rs), np.asarray(Ts)
    Xs = rng.uniform(-3, 3, (Lm, 3))

    obs = np.zeros((Lm, K, 2))
    mask = np.zeros((Lm, K), bool)
    for l in range(Lm):
        for k in range(K):
            Xc = Rs[k].T @ (Xs[l] - Ts[k])
            if Xc[2] > 1.0:
                obs[l, k] = Xc[:2] / Xc[2] + rng.standard_normal(2) \
                    * noise_px
                mask[l, k] = True

    # perturb initial guess (keep poses 0,1 at truth: monocular BA has a
    # 7-dof gauge — one anchored pose pins SE3, the second pins scale)
    Rs0 = Rs.copy()
    Ts0 = Ts.copy()
    for k in range(2, K):
        Rs0[k] = Rs[k] @ np.asarray(
            so3.exp(jnp.asarray(rng.standard_normal(3) * perturb)))
        Ts0[k] = Ts[k] + rng.standard_normal(3) * perturb * 4
    Xs0 = Xs + rng.standard_normal((Lm, 3)) * perturb * 4

    fixed = np.zeros(K, bool)
    fixed[0] = True
    fixed[1] = True
    p = BAProblem(Rs=jnp.asarray(Rs0, dtype), Ts=jnp.asarray(Ts0, dtype),
                  Xs=jnp.asarray(Xs0, dtype), obs=jnp.asarray(obs, dtype),
                  mask=jnp.asarray(mask), fixed=jnp.asarray(fixed))
    return p, (Rs, Ts, Xs)


def test_ba_converges_noise_free():
    p, (Rs, Ts, Xs) = make_problem()
    p2, chi2 = solve(p, iters=15, damping=1e-6)
    # chi2 decreases by many orders of magnitude
    assert float(chi2[-1]) < 1e-12 * max(float(chi2[0]), 1e-30) \
        or float(chi2[-1]) < 1e-14
    # poses recovered (gauge fixed at pose 0 = truth, so absolute compare)
    assert np.allclose(np.asarray(p2.Ts), Ts, atol=1e-6)
    for k in range(len(Ts)):
        assert np.allclose(np.asarray(p2.Rs)[k], Rs[k], atol=1e-6)
    seen = np.asarray(jnp.any(p.mask, axis=1))
    assert np.allclose(np.asarray(p2.Xs)[seen], Xs[seen], atol=1e-5)


def test_ba_with_noise_improves():
    p, (Rs, Ts, Xs) = make_problem(noise_px=0.002, perturb=0.08, seed=3)
    err0 = np.linalg.norm(np.asarray(p.Ts) - Ts)
    p2, chi2 = solve(p, iters=15, damping=1e-5)
    err1 = np.linalg.norm(np.asarray(p2.Ts) - Ts)
    assert err1 < 0.15 * err0, (err0, err1)
    assert float(chi2[-1]) < float(chi2[0])


def test_ba_huber_downweights_outliers():
    p, (Rs, Ts, Xs) = make_problem(noise_px=0.001, perturb=0.05, seed=4)
    # corrupt some observations badly
    obs = np.array(p.obs)   # writable copy
    mask = np.asarray(p.mask)
    rng = np.random.default_rng(9)
    cnt = 0
    for l in range(8):
        ks = np.nonzero(mask[l])[0]
        if len(ks):
            obs[l, ks[0]] += rng.standard_normal(2) * 0.5
            cnt += 1
    assert cnt >= 4
    p_bad = p._replace(obs=jnp.asarray(obs))
    p_no, _ = solve(p_bad, iters=15, damping=1e-5, huber_thresh=1e9)
    p_hub, _ = solve(p_bad, iters=15, damping=1e-5, huber_thresh=0.01)
    err_no = np.linalg.norm(np.asarray(p_no.Ts) - Ts)
    err_hub = np.linalg.norm(np.asarray(p_hub.Ts) - Ts)
    # raw LM diverges (NaN) on these gross outliers; Huber keeps the
    # solve finite and accurate
    assert np.isfinite(err_hub) and err_hub < 0.2
    assert (not np.isfinite(err_no)) or err_hub < err_no


def test_lm_monotone_under_large_perturbation():
    """Adaptive LM accept/reject (round-4 fix): a fixed-damping GN loop
    diverged in-stream on a keyframe-dense map (chi2 +5e5 on one
    refine_map call, ARCHITECTURE.md round-4). With step rejection the
    chi2 history is monotone non-increasing even from a grossly
    perturbed init at near-zero initial damping."""
    p, _ = make_problem(perturb=0.4, seed=3)
    _, hist = solve(p, iters=12, damping=1e-9)
    h = np.asarray(hist)
    assert np.all(np.diff(h) <= 1e-9 * np.maximum(h[:-1], 1.0)), h
    assert h[-1] < h[0]
