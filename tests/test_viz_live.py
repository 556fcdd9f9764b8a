"""Live viewer smoke tests (headless Agg rendering path).

Parity target: the reference Pangolin viewer's update surface
(src/viewer.h:17-49) — Update_gsb/gbc/gsc, Update(img), Refresh — and
its body-trajectory trace + camera frustum drawing.
"""
import numpy as np

from xivo_tpu.viz_live import LiveViewer


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_live_viewer_update_refresh(tmp_path):
    v = LiveViewer(interactive=False, imh=48, imw=64, fx=40, fy=40,
                   cx=32, cy=24)
    rng = np.random.default_rng(0)
    for k in range(5):
        a = 0.2 * k
        v.Update_gsb(_rot_z(a), np.array([np.cos(a), np.sin(a), 0.1 * k]))
        v.Update_gbc(np.eye(3), np.array([0.01, 0.0, 0.02]))
        v.Update(rng.integers(0, 255, (48, 64)).astype(np.uint8))
        v.Update_landmarks(rng.uniform(-2, 2, (17, 3)))
        v.Refresh()
    assert v.n_refreshed == 5
    assert len(v._trace) == 5
    # frustum apex follows gsb*gbc composition
    Rsc, Tsc = v._gsc()
    a = 0.8
    exp = _rot_z(a) @ np.array([0.01, 0.0, 0.02]) \
        + np.array([np.cos(a), np.sin(a), 0.4])
    assert np.allclose(Tsc, exp)
    out = v.save_frame(str(tmp_path / "frame.png"))
    assert (tmp_path / "frame.png").stat().st_size > 1000
    # explicit gsc override wins (Update_gsc parity)
    v.Update_gsc(np.eye(3), np.array([9.0, 9.0, 9.0]))
    v.Refresh()
    assert np.allclose(v._gsc()[1], [9.0, 9.0, 9.0])
    v.close()


def test_estimator_visualize_live(tmp_path):
    """Estimator.Visualize(live=True) drives the viewer end-to-end."""
    from xivo_tpu.api import Estimator
    from xivo_tpu.filter.config import config_from_json
    from tests.test_api import run_short
    from tests.test_e2e_pcw import PCW_CFG

    est = Estimator(config_from_json(PCW_CFG, dtype="float64",
                                     sim_initialize_depths=True))
    run_short(est, T=0.5)
    v = est.Visualize(live=True, save_path=str(tmp_path / "live.png"))
    v2 = est.Visualize(live=True)
    assert v is v2 and v.n_refreshed == 2
    assert (tmp_path / "live.png").stat().st_size > 1000
    v.close()
