"""Filter-consistency regression (the round-1 'NEES ~7000' finding).

Round-1 honest measurement: extrinsics NEES ~7e3 on the tube-world
study even with FEJ+OC — the filter was drastically overconfident.
Round-2 fix: MSCKF pose cloning + OOS harvest + correlated feature-init
covariance repair the information bookkeeping. Measured on the 25 s
study (scripts/eval_consistency.py):

    fej+oc            ATE 2.02   Tbc err 0.123   NEES 7456
    fej+oc+ic+oos     ATE 0.12   Tbc err 0.021   NEES  152   (~40x)

This test pins a shortened (12 s) version of that contrast.
"""
import numpy as np
import pytest

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


@pytest.mark.parametrize("dummy", [0])
@pytest.mark.slow
def test_consistency_stack_reduces_nees(dummy):
    from eval_consistency import run_case

    true_Tbc = np.array([0.03, -0.02, 0.04])
    true_Wbc = np.array([-1.57079633 + 0.02, -0.015, 0.01])

    ate0, tbce0, nees0 = run_case(12.0, use_fej=True, use_oc=True,
                                  true_Tbc=true_Tbc, true_Wbc=true_Wbc)
    ate1, tbce1, nees1 = run_case(
        12.0, use_fej=True, use_oc=True, true_Tbc=true_Tbc,
        true_Wbc=true_Wbc, approximate_init_covariance=True,
        use_OOS=True)

    # >=10x NEES reduction with ATE no worse (the round-2 target)
    assert nees1 < 0.1 * nees0, (nees1, nees0)
    assert ate1 <= ate0 * 1.05, (ate1, ate0)
    assert tbce1 <= tbce0, (tbce1, tbce0)


@pytest.mark.slow
def test_extrinsics_random_walk_reaches_consistency_band():
    """Round-4 frontier close: the tube-world Tbc NEES within an order
    of magnitude of the 3-dof sigma bound (<=30), no ATE regression.

    Measured mechanism (12 s study, /tmp-series diagnostics): with the
    full stack the Tbc ERROR plateaus at a ~2 cm noise-induced bias
    while sigma collapses to ~2 mm — NEES ~83 and growing with noise
    (83 -> 240 -> 582 at 0.25/0.5/1.0 px), i.e. linearization drift,
    not bookkeeping (measurement-side OC projection made it WORSE:
    the gauge-fixed design already pins the global directions). The
    honest remedy is modeling that drift as a small extrinsics random
    walk: Qmodel Tbc=Wbc=3e-4 floors sigma near the bias scale.
    Measured: NEES 83.4 -> 17.2, ATE 0.184 -> 0.185 (unchanged), Tbc
    err 0.0296 -> 0.0257 (improved).
    """
    from eval_consistency import run_case

    true_Tbc = np.array([0.03, -0.02, 0.04])
    true_Wbc = np.array([-1.57079633 + 0.02, -0.015, 0.01])
    ate, tbce, nees = run_case(
        12.0, use_fej=True, use_oc=True, true_Tbc=true_Tbc,
        true_Wbc=true_Wbc, approximate_init_covariance=True,
        use_OOS=True, Qmodel_Tbc=3e-4, Qmodel_Wbc=3e-4)
    assert nees < 30.0, nees              # order of magnitude of ~3
    assert ate < 0.25, ate                # no regression vs 0.184 stack
    assert tbce < 0.05, tbce
