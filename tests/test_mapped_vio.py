"""End-to-end mapped VIO: the filter + retirement + loop closure running
together on the PCW sim (BASELINE config 5 shape, single device)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.map import init_map
from xivo_tpu.map.integration import vio_frame_mapped
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

pytestmark = pytest.mark.slow  # heavy tier: XIVO_SLOW=1 runs these


def test_mapped_vio_runs_and_map_grows():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True, use_mapper=True,
                           lc_nn_dist_thresh=5)
    fi, gt = build_pcw_stream(cfg, total_time=6.0, noise_px=0.25)
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    ms = init_map(2048, dtype=jnp.float64)

    from functools import partial
    step = jax.jit(partial(vio_frame_mapped, cfg))

    T = fi.frame_dt.shape[0]
    errs, lcs = [], []
    for t in range(T):
        s, ms, out, n_lc = step(s, ms, fi.gyro[t], fi.accel[t],
                                fi.imu_dt[t], fi.frame_dt[t],
                                fi.meas_id[t], fi.meas_xp[t],
                                fi.meas_depth[t], fi.meas_valid[t])
        errs.append(np.linalg.norm(np.asarray(out.Tsb) - gt["Tsb"][t]))
        lcs.append(int(n_lc))
    errs = np.asarray(errs)
    # filter stays accurate with the mapper in the loop
    assert np.sqrt(np.mean(errs ** 2)) < 0.15
    # features were retired into the map as tracks churned
    assert int(ms.count) > 0
    assert np.isfinite(np.asarray(s.P)).all()
