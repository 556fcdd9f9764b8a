"""IO tests: build a tiny synthetic ASL dataset on disk, replay it
through the CLI-equivalent path, check a sane trajectory comes out."""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.io import load_asl, ImageMsg, IMUMsg, TrajectoryWriter
from xivo_tpu.sim import get_imu_sim
from xivo_tpu.sim.render import render_dots


def build_synthetic_asl(tmpdir, T=2.0, imu_dt=0.01, vis_dt=0.1):
    """Write an ASL-format dataset of rendered dot images + IMU csv."""
    from xivo_tpu.geom import so3
    from tests.test_image_vio import IMG_CFG, make_world
    from xivo_tpu.filter.config import config_from_json

    cfg = config_from_json(IMG_CFG)
    imu = get_imu_sim("gentle", T=T + 1, noise_accel=0, noise_gyro=0,
                      seed=1)
    Xs = make_world(400, seed=2)
    K = np.array([[200.0, 0, 160], [0, 200, 120], [0, 0, 1]])
    Rbc = np.asarray(so3.exp(jnp.asarray(cfg.X_Wbc)))
    Tbc = np.asarray(cfg.X_Tbc)

    cam_dir = os.path.join(tmpdir, "seq", "cam0")
    imu_dir = os.path.join(tmpdir, "seq", "imu0")
    os.makedirs(os.path.join(cam_dir, "data"))
    os.makedirs(imu_dir)

    rows = []
    for t in np.arange(0, T, vis_dt):
        ns = int(round(t * 1e9))
        Rsb, Tsb = imu.gsb(t)
        img = render_dots(Xs, Rsb @ Rbc, Rsb @ Tbc + Tsb, K, 320, 240)
        name = f"{ns}.npy"
        np.save(os.path.join(cam_dir, "data", name), img)
        rows.append(f"{ns},{name}")
    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("#ts,filename\n" + "\n".join(rows) + "\n")

    rows = []
    for t in np.arange(0, T, imu_dt):
        ns = int(round(t * 1e9))
        a, g = imu.meas(t)
        rows.append(",".join([str(ns)] + [f"{x:.9f}" for x in g]
                             + [f"{x:.9f}" for x in a]))
    with open(os.path.join(imu_dir, "data.csv"), "w") as f:
        f.write("#ts,gx,gy,gz,ax,ay,az\n" + "\n".join(rows) + "\n")
    return imu, cfg


@pytest.mark.slow
def test_asl_roundtrip_and_replay(tmp_path):
    imu, _ = build_synthetic_asl(str(tmp_path))
    entries = load_asl(str(tmp_path / "seq" / "cam0"),
                       str(tmp_path / "seq" / "imu0"))
    n_img = sum(isinstance(e, ImageMsg) for e in entries)
    n_imu = sum(isinstance(e, IMUMsg) for e in entries)
    assert n_img == 20 and n_imu == 200
    # timestamps sorted
    ts = [e.ts for e in entries]
    assert ts == sorted(ts)
    # image decodes
    img = next(e for e in entries if isinstance(e, ImageMsg)).image()
    assert img.shape == (240, 320)

    # replay through the streaming API (the vio.py app path)
    from xivo_tpu.api import Estimator
    from tests.test_image_vio import IMG_CFG
    cfg = dict(IMG_CFG)
    est = Estimator(cfg, dtype="float64")
    writer = TrajectoryWriter(str(tmp_path / "traj.txt"))
    for e in entries:
        if isinstance(e, IMUMsg):
            est.InertialMeas(e.ts, e.gyro, e.accel)
        else:
            est.VisualMeas(e.ts, e.image())
            Rsb, Tsb = est.gsb()
            writer.add(e.ts, Rsb, Tsb)
    writer.write()
    # trajectory file exists with the right shape + finite poses
    lines = open(tmp_path / "traj.txt").read().strip().splitlines()
    assert len(lines) == 20
    vals = np.asarray([[float(x) for x in ln.split()] for ln in lines])
    assert vals.shape == (20, 8)
    assert np.isfinite(vals).all()
    # trajectory stays bounded near the (short, gentle) ground truth
    Rsb, Tsb_true = imu.gsb(vals[-1, 0])
    assert np.linalg.norm(vals[-1, 1:4] - Tsb_true) < 1.0
