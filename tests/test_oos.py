"""MSCKF/OOS update tests."""
import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from tests.test_e2e_pcw import PCW_CFG, run_scan


def test_nullspace_projection_property():
    """The projected OOS rows must be orthogonal to the landmark Jacobian."""
    import jax
    Hf = jnp.asarray(np.random.default_rng(0).standard_normal((30, 3)))
    # zero some rows (masked observations)
    Hf = Hf.at[10:].set(0.0)
    Q, _ = jnp.linalg.qr(Hf, mode="complete")
    A = Q[:, 3:]
    assert np.allclose(np.asarray(A.T @ Hf), 0.0, atol=1e-10)
    # A spans 2G-3 dims
    assert A.shape == (30, 27)


def test_oos_update_runs_and_tracks():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True, use_OOS=True,
                           OOS_min_observations=5)
    s, outs, gt = run_scan(cfg, total_time=6.0, noise_px=0.25)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = np.sqrt(np.mean(err ** 2))
    assert np.isfinite(np.asarray(s.P)).all()
    assert rmse < 0.12, rmse
