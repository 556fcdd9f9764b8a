"""Error-state retraction: nominal state ⊞ error vector.

Mirrors ``State::operator+=`` (src/core.h:135-165) plus the IMU-intrinsics
and camera-intrinsics updates applied by ``Estimator::AbsorbError``
(src/estimator.cpp:875-921). Shared by the filter's absorb step and by the
finite-difference Jacobian tests (the same composition the reference's
``unittest_jacobians_instate`` perturbs through).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geom import so3
from . import layout as L
from .state import MotionState


def apply_motion_error(X: MotionState, err) -> MotionState:
    """err: (MOTION,) tangent update; right-multiplicative on rotations."""
    dRsb = so3.exp(err[L.WSB:L.WSB + 3])
    dRbc = so3.exp(err[L.WBC:L.WBC + 3])
    wsg = jnp.concatenate([err[L.WSG:L.WSG + 2],
                           jnp.zeros((1,), err.dtype)])
    dRsg = so3.exp(wsg)

    Rsb = so3.project(X.Rsb @ dRsb)
    Rbc = so3.project(X.Rbc @ dRbc)
    # NOTE: the error never carries a z-component for Wsg (2-dim block), so
    # Rsg's z-drift stays second-order; the reference re-projects it to
    # z=0 only every 50 updates (src/core.h:154-161), not per update, and
    # doing it here would break the retraction's symmetry for FD tests.
    Rsg = so3.project(X.Rsg @ dRsg)

    # IMU intrinsics: Cg full 3x3 (9 params row-major), Ca upper-tri (6)
    Cg = X.Cg + err[L.CG:L.CG + 9].reshape(3, 3)
    Ca = X.Ca + so3.upper_tri_from6(err[L.CA:L.CA + 6])

    return MotionState(
        Rsb=Rsb,
        Tsb=X.Tsb + err[L.TSB:L.TSB + 3],
        Vsb=X.Vsb + err[L.VSB:L.VSB + 3],
        bg=X.bg + err[L.BG:L.BG + 3],
        ba=X.ba + err[L.BA:L.BA + 3],
        Rbc=Rbc,
        Tbc=X.Tbc + err[L.TBC:L.TBC + 3],
        Rsg=Rsg,
        td=X.td + err[L.TD],
        Cg=Cg, Ca=Ca,
    )


def apply_camera_error(intrin, err_cam):
    """Camera intrinsics update (A_*Camera::UpdateState parity)."""
    return intrin + err_cam


def apply_group_error(Rsb, Tsb, err6):
    """Group pose tangent update (src/group.h:24-30)."""
    return so3.project(Rsb @ so3.exp(err6[:3])), Tsb + err6[3:6]
