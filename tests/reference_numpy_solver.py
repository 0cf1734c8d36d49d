"""Independent NumPy reimplementation of the explicit scheme, for
cross-validation only.

The reference validates its Julia solver against an independently
written MATLAB twin (``MATLAB/basepdesolver.m`` /
``MATLAB/basepdesolver_rect.m`` run on the same ensemble).  This module
plays the MATLAB role for our framework: a deliberately naive,
scalar-python/NumPy transcription of the numerical scheme (FTCS
interior update, zero-flux center, semi-implicit membrane fixed
point), sharing no code or array layout with the JAX implementation.
Slow by design — only run on coarse grids in tests.

Variants are covered the same way the MATLAB twin covers them —
independent transcription of the scheme, not of our code:

  * ``geometry="rect"`` — Cartesian Laplacian, no ``1/r`` metric term
    (``basepdesolver_rect.jl:132-133`` / ``MATLAB/basepdesolver_rect.m``)
  * ``memb_sfk=True`` — active-SFK diffusivity pinned to 1e-32 in both
    the stencil and its ghost-node closure (``basepdesolver.jl:366,530``)
  * ``t_prechase=...`` — gefitinib pulse-chase: kp set to 0 for every
    step whose start time has reached ``t_prechase``
    (``pulsechase_solver.jl:156-158``)
"""

from __future__ import annotations

import numpy as np


def solve_numpy(Co, D, k, R=10.0, dr=0.5, tf=0.5, Nts=2, maxiters=100,
                tol=1e-6, dt=None, geometry="spherical", memb_sfk=False,
                t_prechase=None):
    """Returns dict of final-time arrays and the saved pE trace."""
    (kS2f, kS2r, kG1f, kG1r, kG2f, kG2r, kG1p, kG1dp, kSa, kSi, kp, kdp,
     kEGFf, kEGFr, EGF, kdf, kdr) = [float(x) for x in k]
    D_S, D_G2, D_G2G1, D_G2G1S2, D_G1, D_G1S2, D_S2 = [float(x) for x in D]
    D_Sa = 1e-32 if memb_sfk else D_S
    CoSFK, CoG2, CoG1, CoS2, CoEGFR = [float(x) for x in Co]
    if geometry not in ("spherical", "rect"):
        raise ValueError(geometry)
    spherical = geometry == "spherical"

    if dt is None:
        dt = 0.99 / (2.0 * (max(D) / dr**2 + sum(k) / 4.0))
    Nr = int(np.ceil(R / dr))
    Nt = int(np.ceil(tf / dt))
    r = np.arange(Nr + 1) * dr

    # species arrays, old and new columns
    names = ["iSFK", "aSFK", "GAB1", "pGAB1", "GRB2", "G2G1", "G2PG1",
             "SHP2", "PG1S", "G2PG1S"]
    c_old = {n: np.zeros(Nr + 1) for n in names}
    c_new = {n: np.zeros(Nr + 1) for n in names}
    c_old["iSFK"][:] = CoSFK
    c_old["GAB1"][:] = CoG1
    c_old["GRB2"][:] = CoG2
    c_old["SHP2"][:] = CoS2
    m_old = {"mE": CoEGFR, "mES": 0.0, "mESmES": 0.0, "E": 0.0, "EG2": 0.0,
             "EG2G1": 0.0, "EG2PG1": 0.0, "EG2PG1S": 0.0}
    m_new = {n: 0.0 for n in m_old}
    cr_guess = {n: 0.0 for n in names}

    diff = {"iSFK": D_S, "aSFK": D_Sa, "GAB1": D_G1, "pGAB1": D_G1,
            "GRB2": D_G2, "G2G1": D_G2G1, "G2PG1": D_G2G1, "SHP2": D_S2,
            "PG1S": D_G1S2, "G2PG1S": D_G2G1S2}

    def reactions(c, j):
        iS, aS = c["iSFK"][j], c["aSFK"][j]
        G1, pG1 = c["GAB1"][j], c["pGAB1"][j]
        G2, G2G1v, G2PG1v = c["GRB2"][j], c["G2G1"][j], c["G2PG1"][j]
        S2, PG1Sv, G2PG1Sv = c["SHP2"][j], c["PG1S"][j], c["G2PG1S"][j]
        return {
            "iSFK": kSi * aS,
            "aSFK": -kSi * aS,
            "GAB1": -kG1f * G1 * G2 + kG1r * G2G1v - kG1p * aS * G1
                    + kG1dp * pG1,
            "pGAB1": -kG1f * pG1 * G2 + kG1r * G2PG1v + kG1p * aS * G1
                     - kG1dp * pG1 - kS2f * S2 * pG1 + kS2r * PG1Sv,
            "GRB2": -kG1f * G1 * G2 + kG1r * G2G1v - kG1f * pG1 * G2
                    + kG1r * G2PG1v - kG1f * G2 * PG1Sv + kG1r * G2PG1Sv,
            "G2G1": kG1f * G1 * G2 - kG1r * G2G1v - kG1p * aS * G2G1v
                    + kG1dp * G2PG1v,
            "G2PG1": kG1f * pG1 * G2 - kG1r * G2PG1v + kG1p * aS * G2G1v
                     - kG1dp * G2PG1v - kS2f * S2 * G2PG1v + kS2r * G2PG1Sv,
            "SHP2": -kS2f * S2 * pG1 + kS2r * PG1Sv - kS2f * S2 * G2PG1v
                    + kS2r * G2PG1Sv,
            "PG1S": kS2f * S2 * pG1 - kS2r * PG1Sv - kG1f * G2 * PG1Sv
                    + kG1r * G2PG1Sv,
            "G2PG1S": kG1f * G2 * PG1Sv - kG1r * G2PG1Sv
                      + kS2f * S2 * G2PG1v - kS2r * G2PG1Sv,
        }

    pE_trace = [0.0]
    t, t_save, dt_save = 0.0, tf / Nts, tf / Nts

    for _ in range(Nt):
        if t_prechase is not None and t >= t_prechase:
            kp = 0.0  # gefitinib blocks EGFR phosphorylation
        # interior FTCS
        for j in range(1, Nr):
            rx = reactions(c_old, j)
            for n in names:
                u = c_old[n]
                lap = (u[j + 1] - 2.0 * u[j] + u[j - 1]) / dr**2
                if spherical:
                    lap += 1.0 / (r[j] * dr) * (u[j + 1] - u[j - 1])
                c_new[n][j] = (diff[n] * lap + rx[n]) * dt + u[j]
        for n in names:
            c_new[n][0] = c_new[n][1]

        # membrane fixed point
        cr = dict(cr_guess)
        mm = dict(m_new)
        for _ in range(maxiters):
            cr_prev, mm_prev = dict(cr), dict(mm)
            Etot = 2.0 * (mm["E"] + mm["EG2"] + mm["EG2G1"] + mm["EG2PG1"]
                          + mm["EG2PG1S"])
            cr["iSFK"] = c_new["iSFK"][Nr - 1] / (1 + kSa * Etot * dr / D_S)
            cr["aSFK"] = (c_new["aSFK"][Nr - 1]
                          + kSa * cr["iSFK"] * Etot * dr / D_Sa)
            cr["GAB1"] = ((kG1r * mm["EG2G1"] * dr / D_G1
                           + c_new["GAB1"][Nr - 1])
                          / (1 + kG1f * mm["EG2"] * dr / D_G1))
            cr["pGAB1"] = ((kG1r * mm["EG2PG1"] * dr / D_G1
                            + c_new["pGAB1"][Nr - 1])
                           / (1 + kG1f * mm["EG2"] * dr / D_G1))
            cr["GRB2"] = ((kG2r * mm["EG2"] * dr / D_G2
                           + c_new["GRB2"][Nr - 1])
                          / (1 + kG2f * mm["E"] * dr / D_G2))
            cr["G2G1"] = ((kG2r * mm["EG2G1"] * dr / D_G2G1
                           + c_new["G2G1"][Nr - 1])
                          / (1 + kG2f * mm["E"] * dr / D_G2G1))
            cr["G2PG1"] = ((kG2r * mm["EG2PG1"] * dr / D_G2G1
                            + c_new["G2PG1"][Nr - 1])
                           / (1 + kG2f * mm["E"] * dr / D_G2G1))
            cr["SHP2"] = ((kS2r * mm["EG2PG1S"] * dr / D_S2
                           + c_new["SHP2"][Nr - 1])
                          / (1 + kS2f * mm["EG2PG1"] * dr / D_S2))
            cr["PG1S"] = ((kG1r * mm["EG2PG1S"] * dr / D_G1S2
                           + c_new["PG1S"][Nr - 1])
                          / (1 + kG1f * mm["EG2"] * dr / D_G1S2))
            cr["G2PG1S"] = ((kG2r * mm["EG2PG1S"] * dr / D_G2G1S2
                             + c_new["G2PG1S"][Nr - 1])
                            / (1 + kG2f * mm["E"] * dr / D_G2G1S2))

            mo = m_old
            mm = {
                "mE": (-kEGFf * EGF * mo["mE"] + kEGFr * mo["mES"]) * dt
                      + mo["mE"],
                "mES": (kEGFf * EGF * mo["mE"] - kEGFr * mo["mES"]
                        - 2 * kdf * mo["mES"]**2
                        + 2 * kdr * mo["mESmES"]) * dt + mo["mES"],
                "mESmES": (kdf * mo["mES"]**2 - kdr * mo["mESmES"]
                           - kp * mo["mESmES"] + kdp * mo["E"]) * dt
                          + mo["mESmES"],
                "E": (kp * mo["mESmES"] - kdp * mo["E"]
                      - kG2f * mo["E"] * (cr["GRB2"] + cr["G2G1"]
                                          + cr["G2PG1"] + cr["G2PG1S"])
                      + kG2r * (mo["EG2"] + mo["EG2G1"] + mo["EG2PG1"]
                                + mo["EG2PG1S"])) * dt + mo["E"],
                "EG2": (kG2f * cr["GRB2"] * mo["E"] - kG2r * mo["EG2"]
                        - kG1f * mo["EG2"] * (cr["GAB1"] + cr["pGAB1"]
                                              + cr["PG1S"])
                        + kG1r * (mo["EG2G1"] + mo["EG2PG1"]
                                  + mo["EG2PG1S"])) * dt + mo["EG2"],
                "EG2G1": (kG2f * cr["G2G1"] * mo["E"] - kG2r * mo["EG2G1"]
                          + kG1f * cr["GAB1"] * mo["EG2"]
                          - kG1r * mo["EG2G1"]) * dt + mo["EG2G1"],
                "EG2PG1": (kG2f * cr["G2PG1"] * mo["E"]
                           - kG2r * mo["EG2PG1"]
                           + kG1f * cr["pGAB1"] * mo["EG2"]
                           - kG1r * mo["EG2PG1"]
                           - kS2f * cr["SHP2"] * mo["EG2PG1"]
                           + kS2r * mo["EG2PG1S"]) * dt + mo["EG2PG1"],
                "EG2PG1S": (kS2f * cr["SHP2"] * mo["EG2PG1"]
                            - kS2r * mo["EG2PG1S"]
                            + kG1f * cr["PG1S"] * mo["EG2"]
                            - kG1r * mo["EG2PG1S"]
                            + kG2f * cr["G2PG1S"] * mo["E"]
                            - kG2r * mo["EG2PG1S"]) * dt + mo["EG2PG1S"],
            }
            errs = []
            for n in names:
                errs.append(abs(1.0 - cr[n] / cr_prev[n])
                            if cr_prev[n] != 0 else np.inf)
            for n in mm:
                errs.append(abs(1.0 - mm[n] / mm_prev[n])
                            if mm_prev[n] != 0 else np.inf)
            err = max(errs)
            if err <= tol:
                break

        for n in names:
            c_new[n][Nr] = cr[n]
            c_old[n][:] = c_new[n]
        m_old = dict(mm)
        m_new = dict(mm)
        cr_guess = dict(cr)

        t += dt
        if t >= t_save:
            Etot = 2.0 * (mm["E"] + mm["EG2"] + mm["EG2G1"] + mm["EG2PG1"]
                          + mm["EG2PG1S"])
            pE_trace.append(Etot * 100.0 / CoEGFR)
            t_save += dt_save

    out = {n: c_old[n].copy() for n in names}
    out.update({f"m_{n}": v for n, v in m_old.items()})
    out["pE"] = np.array(pE_trace)
    out["r"] = r
    return out
