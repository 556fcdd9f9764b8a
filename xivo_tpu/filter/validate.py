"""State invariant validation (debug tooling).

The masked-table analogue of the reference's Graph::SanityCheck and the
NDEBUG bookkeeping CHECKs (src/graph.h:77-86, src/manager.cpp:49-100):
pure host-side assertions over a VIOState snapshot, used by tests and
available for debugging sessions. Not on any hot path.
"""
from __future__ import annotations

import numpy as np

from .config import VIOConfig
from .state import FS_GAUGE, FS_INSTATE, VIOState


def validate_state(cfg: VIOConfig, s: VIOState) -> list:
    """Returns a list of violated-invariant descriptions (empty = OK)."""
    errs = []
    fr, gr = s.features, s.groups
    fid = np.asarray(fr.fid)
    fsind = np.asarray(fr.sind)
    fref = np.asarray(fr.ref)
    status = np.asarray(fr.status)
    gid = np.asarray(gr.gid)
    gsind = np.asarray(gr.sind)
    f2row = np.asarray(s.f2row)
    g2row = np.asarray(s.g2row)
    P = np.asarray(s.P)
    if P.shape[0] != P.shape[1]:   # sqrt form: reconstruct P = S S^T
        P = P @ P.T
    d = cfg.dims

    # slot maps are inverse of sind
    for slot, row in enumerate(f2row):
        if row >= 0 and fsind[row] != slot:
            errs.append(f"f2row[{slot}]={row} but sind[{row}]={fsind[row]}")
    for slot, row in enumerate(g2row):
        if row >= 0 and gsind[row] != slot:
            errs.append(f"g2row[{slot}]={row} but sind[{row}]={gsind[row]}")
    # instate features: active, valid slot, ref instate
    inst = fsind >= 0
    if np.any(inst & (fid < 0)):
        errs.append("instate feature on inactive row")
    bad_ref = inst & ((fref < 0) | (gsind[np.clip(fref, 0, len(gid) - 1)]
                                    < 0))
    if np.any(bad_ref):
        errs.append(f"instate features with non-instate refs: "
                    f"{np.nonzero(bad_ref)[0].tolist()}")
    # instate statuses consistent
    if np.any(inst & ~np.isin(status, [FS_INSTATE, FS_GAUGE])):
        errs.append("instate feature with non-instate status")
    if np.any(~inst & np.isin(status, [FS_INSTATE, FS_GAUGE]) & (fid >= 0)):
        errs.append("non-instate feature carries instate status")
    # every active feature's ref row is an active group
    act = fid >= 0
    ref_ok = (fref >= 0) & (gid[np.clip(fref, 0, len(gid) - 1)] >= 0)
    created = np.asarray(fr.track) == 1
    if np.any(act & ~created & ~ref_ok):
        errs.append("active feature referencing dead group row")
    # covariance: finite, symmetric; freed slots carry zero rows
    if not np.isfinite(P).all():
        errs.append("non-finite covariance")
    if not np.allclose(P, P.T, atol=1e-6):
        errs.append("asymmetric covariance")
    for slot in range(d.n_features):
        if f2row[slot] < 0:
            off = d.feature_off(slot)
            if np.abs(P[off:off + 3]).max() > 0:
                errs.append(f"freed feature slot {slot} has nonzero cov")
    for slot in range(d.n_groups):
        if g2row[slot] < 0:
            off = d.group_off(slot)
            if np.abs(P[off:off + 6]).max() > 0:
                errs.append(f"freed group slot {slot} has nonzero cov")
    return errs
