"""Soft-constraint coefficient derivation and stability study.

Python port of the reference's Octave analysis (reference:
extras/soft_constraint.m:1-76): a two-particle mass-spring system with a huge
mass ratio, solved with the soft-constraint coefficient triple

    biasCoefficient    = omega / (2 zeta + h omega)
    c                  = h omega (2 zeta + h omega)
    impulseCoefficient = 1 / (1 + c)
    massCoefficient    = c * impulseCoefficient

(the same coefficients used by s2PrepareContacts_Soft, reference:
src/solve_common.c:264-271). The study demonstrates the relax pass's effect on
the stability limit: without relax the system is stable up to ~13.5 Hz, with
relax up to ~20.5 Hz (soft_constraint.m:7-8).

Run: python extras/soft_constraint.py
"""

from __future__ import annotations

import numpy as np


def simulate(hertz: float, relax: bool, steps: int = 10000):
    """Returns the trajectory of the two particle heights [steps+1, 2]."""
    ys = np.array([0.0, -1.0])
    vs = np.array([0.0, 0.0])
    ms = np.array([0.167, 0.000995])
    km = np.array([ms[0], ms[0] + ms[1]])
    em = 1.0 / km
    h = 1.0 / 60.0
    zeta = 0.0
    omega = 2.0 * np.pi * hertz
    bias_coeff = omega / (2.0 * zeta + h * omega)
    c = h * omega * (2.0 * zeta + h * omega)
    impulse_coeff = 1.0 / (1.0 + c)
    mass_coeff = c * impulse_coeff

    lambdas = np.array([0.0, 0.0])
    out = [ys.copy()]
    for _ in range(steps):
        vs += -10.0 * h

        # warm start
        vs[0] += ms[0] * (lambdas[0] - lambdas[1])
        vs[1] += ms[1] * lambdas[1]

        # biased solve
        lam1 = -mass_coeff * em[0] * (vs[0] + bias_coeff * ys[0]) - impulse_coeff * lambdas[0]
        lambdas[0] += lam1
        vs[0] += ms[0] * lam1

        c2 = ys[1] - ys[0] + 1.0
        lam2 = -mass_coeff * em[1] * ((vs[1] - vs[0]) + bias_coeff * c2) - impulse_coeff * lambdas[1]
        lambdas[1] += lam2
        vs[0] -= ms[0] * lam2
        vs[1] += ms[1] * lam2

        ys += h * vs

        if relax:
            lam1 = -em[0] * vs[0]
            lambdas[0] += lam1
            vs[0] += ms[0] * lam1
            lam2 = -em[1] * (vs[1] - vs[0])
            lambdas[1] += lam2
            vs[0] -= ms[0] * lam2
            vs[1] += ms[1] * lam2

        out.append(ys.copy())
        if not np.isfinite(ys).all() or np.abs(ys).max() > 1e6:
            break
    return np.array(out)


def stable(hertz: float, relax: bool) -> bool:
    traj = simulate(hertz, relax)
    return bool(np.isfinite(traj).all() and np.abs(traj[-100:]).max() < 10.0)


def stability_limit(relax: bool, lo=5.0, hi=40.0, tol=0.25) -> float:
    """Bisect the highest stable stiffness."""
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if stable(mid, relax):
            lo = mid
        else:
            hi = mid
    return lo


if __name__ == "__main__":
    no_relax = stability_limit(relax=False)
    with_relax = stability_limit(relax=True)
    print(f"stability limit without relax: ~{no_relax:.1f} Hz (reference: ~13.5)")
    print(f"stability limit with relax:    ~{with_relax:.1f} Hz (reference: ~20.5)")
    assert with_relax > no_relax, "relax pass must extend the stable range"
