"""Output serialization.

Port of the reference saver lattice (scripts/savers.py: Eval/Dump/
CovDump modes) and the `vio` app's "ts Tsb Wsb" trajectory lines
(src/app/vio.cpp:101-106).
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..geom import so3


class TrajectoryWriter:
    """TUM-format trajectory: 'ts tx ty tz qx qy qz qw' per line
    (what run_and_eval consumes)."""

    def __init__(self, path: str):
        self.path = path
        self.rows: List[str] = []

    def add(self, ts: float, Rsb: np.ndarray, Tsb: np.ndarray):
        import jax.numpy as jnp
        w = np.asarray(so3.log(jnp.asarray(Rsb)))
        from scipy.spatial.transform import Rotation
        q = Rotation.from_matrix(np.asarray(Rsb)).as_quat()  # x y z w
        self.rows.append(
            f"{ts:.9f} {Tsb[0]:.9f} {Tsb[1]:.9f} {Tsb[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}")

    def write(self):
        os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                    exist_ok=True)
        with open(self.path, "w") as f:
            f.write("\n".join(self.rows) + "\n")


class StateDumpWriter:
    """Full-state JSON dump per frame (scripts/savers.py DumpModeSaver):
    pose, velocity, biases, calib states, optional covariance."""

    def __init__(self, path: str, save_cov: bool = False):
        self.path = path
        self.save_cov = save_cov
        self.frames = []

    def add(self, ts: float, est):
        X = est.state.X
        rec = dict(
            ts=ts,
            Tsb=np.asarray(X.Tsb).tolist(),
            Wsb=np.asarray(so3.log(X.Rsb)).tolist(),
            Vsb=np.asarray(X.Vsb).tolist(),
            bg=np.asarray(X.bg).tolist(),
            ba=np.asarray(X.ba).tolist(),
            Tbc=np.asarray(X.Tbc).tolist(),
            Wbc=np.asarray(so3.log(X.Rbc)).tolist(),
            td=float(X.td),
            num_instate_features=est.num_instate_features(),
            num_instate_groups=est.num_instate_groups(),
        )
        if self.save_cov:
            rec["Pstate"] = est.Pstate().tolist()
        self.frames.append(rec)

    def write(self):
        os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                    exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self.frames, f)
