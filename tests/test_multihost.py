"""Multi-host (multi-process) mesh tests — the DCN half of SURVEY §2.6.

Spawns a REAL two-process JAX cluster on localhost
(jax.distributed.initialize, 2 processes x 4 virtual CPU devices) and
proves the sharded VIO runner and the distributed BA produce the same
results on the process-spanning 8-device mesh as this (single) process
does on its own 8-device mesh. This is the standard JAX multi-host test
pattern the survey anticipates; no reference anchor exists (the
reference is single-process) — north-star requirement, BASELINE.md
"N>=2 hosts".
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg():
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.layout import Dims
    from xivo_tpu.sim.configs import PCW_CFG
    return config_from_json(
        PCW_CFG, dims=Dims(n_groups=4, n_features=8, ng_rows=16,
                           nf_rows=32),
        dtype="float32", sim_initialize_depths=True,
        propagation_mode="fast", covariance_form="sqrt")


def _global_inputs(cfg, B=8, T=3):
    """Deterministic B-sequence batch; sequences differ by a per-index
    pixel offset so data layout mistakes cannot cancel out."""
    import jax
    import jax.numpy as jnp
    from xivo_tpu.runner import batch_states, pack_frame_inputs

    rng = np.random.default_rng(0)
    frames = []
    for t in range(T):
        ids = np.arange(12) + 10000
        xp = np.stack([rng.uniform(100, 540, 12),
                       rng.uniform(100, 380, 12)], axis=1)
        frames.append(dict(
            imu=[(0.005, np.zeros(3), np.array([0.0, 9.8, 0.0]))] * 2,
            frame_dt=0.005, ids=ids, xp=xp, depth=np.full(12, 3.0)))
    fi = pack_frame_inputs(frames, imu_cap=4, meas_cap=16,
                           dtype=np.dtype(cfg.dtype))
    fib = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), fi)
    # per-sequence signature: shift every measurement by 0.05*b px
    off = 0.05 * jnp.arange(B, dtype=fib.meas_xp.dtype)
    fib = fib._replace(meas_xp=fib.meas_xp + off[:, None, None, None])

    states = batch_states(cfg, B)
    dt = np.dtype(cfg.dtype)
    states = states._replace(
        last_accel=jnp.broadcast_to(jnp.asarray([0.0, 9.8, 0.0], dt),
                                    (B, 3)).copy())
    return states, fib


def _ba_problem():
    from test_ba import make_problem
    p, _ = make_problem(K=4, Lm=64, perturb=0.05)
    return p


def _worker(pid: int, port: int, outdir: str):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from xivo_tpu.dist.multihost import (global_mesh, init_distributed,
                                         make_multihost_runner)
    ok = init_distributed(f"localhost:{port}", 2, pid)
    assert ok, "cluster bring-up failed"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    mesh = global_mesh()

    cfg = _tiny_cfg()
    states, fib = _global_inputs(cfg)
    # host-local shard: process p owns sequences [4p, 4p+4)
    import jax.numpy as jnp
    sl = slice(4 * pid, 4 * pid + 4)
    states_l = jax.tree.map(lambda x: x[sl], states)
    fib_l = jax.tree.map(lambda x: x[sl], fib)

    run = make_multihost_runner(cfg, mesh)
    s_l, outs_l = run(states_l, fib_l)
    jax.block_until_ready(outs_l.Tsb)
    np.save(os.path.join(outdir, f"vio_tsb_{pid}.npy"),
            np.asarray(outs_l.Tsb))

    # distributed BA over the process-spanning mesh (poses replicated,
    # landmarks sharded 8-ways across both processes)
    from xivo_tpu.dist import make_distributed_solver, shard_problem
    p = _ba_problem()
    solver = make_distributed_solver(mesh, iters=4, damping=1e-5)
    p_out, hist = solver(shard_problem(p, mesh))
    jax.block_until_ready(hist)
    np.save(os.path.join(outdir, f"ba_ts_{pid}.npy"),
            np.asarray(p_out.Ts))          # replicated output
    np.save(os.path.join(outdir, f"ba_hist_{pid}.npy"),
            np.asarray(hist))
    print(f"worker {pid} done", flush=True)


def test_two_process_cluster_matches_single_process(tmp_path):
    """2-process DCN-spanning mesh == single-process 8-device mesh."""
    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(pid),
         str(port), str(tmp_path)],
        env=env, cwd=_REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    # single-process reference on this process's 8 virtual devices
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from xivo_tpu.runner import make_sharded_runner
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    cfg = _tiny_cfg()
    states, fib = _global_inputs(cfg)
    s_ref, outs_ref = make_sharded_runner(cfg, mesh)(states, fib)
    tsb_ref = np.asarray(outs_ref.Tsb)

    tsb_mh = np.concatenate([
        np.load(tmp_path / "vio_tsb_0.npy"),
        np.load(tmp_path / "vio_tsb_1.npy")], axis=0)
    # same per-device program, same per-device batch — bit-comparable
    np.testing.assert_allclose(tsb_mh, tsb_ref, rtol=0, atol=1e-7)
    assert np.isfinite(tsb_mh).all()

    # BA: both processes saw the replicated solution; compare to the
    # single-process distributed solver on the same-size mesh
    from xivo_tpu.dist import make_distributed_solver, shard_problem
    p = _ba_problem()
    p_ref, hist_ref = make_distributed_solver(mesh, iters=4,
                                              damping=1e-5)(
        shard_problem(p, mesh))
    ts0 = np.load(tmp_path / "ba_ts_0.npy")
    ts1 = np.load(tmp_path / "ba_ts_1.npy")
    np.testing.assert_allclose(ts0, ts1, rtol=0, atol=0)   # replicated
    # cross-process psum (gloo) vs in-process psum: fp reduction order
    # may differ; the hysteresis margin (ba.core.ACCEPT_MARGIN) keeps
    # accept decisions aligned, so results agree to reduction noise
    np.testing.assert_allclose(ts0, np.asarray(p_ref.Ts),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.load(tmp_path / "ba_hist_0.npy"),
                               np.asarray(hist_ref), rtol=1e-6,
                               atol=1e-9)


if __name__ == "__main__" and len(sys.argv) >= 2 and sys.argv[1] == "worker":
    sys.path.insert(0, _REPO)
    sys.path.insert(0, os.path.join(_REPO, "tests"))
    _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
