"""Icosahedral quasicrystal approximant generator (imd_qc.c).

Generalized-dual (de Bruijn) construction: six rationalized grid-vector
families (Fibonacci approximants p/q per axis, init_qc imd_qc.c:45),
every triple of grid planes intersected (generate_qc:123), each
intersection's rhombohedron decorated with vertex / edge / large atoms
(decorate:539) and collected with a 0.1-distance duplicate filter
(sortin:674).  Types after the reference's remap: 0 = vertex+edge
atoms, 1 = large atoms (the binary AlPdMn-style decoration).

The analytic tile/atom counts (init_qc:83-95):
    no = 4 (p0 p1 p2 + p2 q0 q1 + p1 q0 q2 + p0 q1 q2 - q0 q1 q2)
    np = 4 (p0 p1 p2 + p1 p2 q0 + p0 p2 q1 + p0 p1 q2 + q0 q1 q2)
    vertex na = np + no, edge nb = 3 na, large nc = 2 np.
"""

from __future__ import annotations

import itertools
import math
from typing import Tuple

import numpy as np

_TAU = (math.sqrt(5.0) + 1.0) / 2.0
_GAM = (0.14, -0.25, 0.33, -0.41, 0.52, -0.33)

# large-atom offset tables for the 10 prolate triples (decorate:560-650):
# per triple, two interior sites; entries are the +-1 added to 2*kf[l]
_PROLATE = {
    (0, 1, 3): ((1, 1, -1, 1, -1, 1), (1, 1, 1, 1, 1, -1)),
    (0, 1, 5): ((1, 1, 1, -1, 1, 1), (1, 1, -1, 1, -1, 1)),
    (0, 2, 3): ((1, -1, 1, 1, -1, 1), (1, 1, 1, 1, 1, -1)),
    (0, 2, 4): ((1, -1, 1, -1, 1, 1), (1, 1, 1, 1, 1, -1)),
    (0, 4, 5): ((1, 1, -1, 1, 1, 1), (1, -1, 1, -1, 1, 1)),
    (1, 2, 4): ((-1, 1, 1, -1, 1, 1), (1, 1, 1, 1, 1, -1)),
    (1, 2, 5): ((1, 1, 1, 1, -1, 1), (-1, 1, 1, -1, 1, 1)),
    (1, 3, 4): ((-1, 1, -1, 1, 1, 1), (1, 1, 1, 1, 1, -1)),
    (2, 3, 5): ((-1, 1, 1, 1, 1, 1), (1, -1, 1, 1, -1, 1)),
    (3, 4, 5): ((1, -1, 1, 1, 1, 1), (-1, 1, -1, 1, 1, 1)),
}


def _fibonacci(order: int) -> Tuple[int, int]:
    p, q = 1, 0
    for _ in range(order):
        p, q = p + q, p
    return p, q


def qc_counts(appr):
    """Analytic atom counts (np, no, na, nb, nc) for an approximant."""
    p = [0, 0, 0]
    q = [0, 0, 0]
    for a in range(3):
        p[a], q[a] = _fibonacci(appr[a])
    no = 4 * (p[0] * p[1] * p[2] + p[2] * q[0] * q[1]
              + p[1] * q[0] * q[2] + p[0] * q[1] * q[2]
              - q[0] * q[1] * q[2])
    np_ = 4 * (p[0] * p[1] * p[2] + p[1] * p[2] * q[0]
               + p[0] * p[2] * q[1] + p[0] * p[1] * q[2]
               + q[0] * q[1] * q[2])
    na = np_ + no
    return np_, no, na, 3 * na, 2 * np_


def generate_qc(appr, scale: float = 1.0):
    """Generate the approximant; returns (pos [n,3], type [n], box_diag).

    ``appr``: Fibonacci orders per axis (box_param of imd_qc.c);
    ``scale`` multiplies all coordinates (the reference works in
    quasilattice constants = 1; scale to Angstroms for real materials).
    """
    tau = np.zeros(3)
    perkah = np.zeros(3)
    for a in range(3):
        p, q = _fibonacci(appr[a])
        tau[a] = p / q if q else np.inf
        perkah[a] = (_TAU * p + q) / math.sqrt(_TAU + 2.0)
    betrag = np.sqrt(tau * tau + 1.0)
    t0, t1 = tau / betrag, 1.0 / betrag
    # grid star (rational) and tiling star (golden), generate_qc:185-208
    G = np.array([
        [t0[0], 0, -t1[2]], [t1[0], t0[1], 0], [0, t1[1], t0[2]],
        [0, -t1[1], t0[2]], [t1[0], -t0[1], 0], [t0[0], 0, t1[2]]])
    bt = math.sqrt(_TAU + 2.0)
    u0, u1 = _TAU / bt, 1.0 / bt
    T = np.array([
        [u0, 0, -u1], [u1, u0, 0], [0, u1, u0],
        [0, -u1, u0], [u1, -u0, 0], [u0, 0, u1]])
    gam = np.asarray(_GAM)
    box = 4.0 * perkah
    c = 0.80
    lmin, lmax = -perkah - c, perkah + c

    # per-grid plane-index ranges from the window corners
    k1min = np.zeros(6, int)
    k1max = np.zeros(6, int)
    corners = np.array(list(itertools.product(*zip(lmin, lmax))))
    for g in range(6):
        v = np.floor(corners @ G[g] - gam[g] + 0.5).astype(int)
        k1min[g], k1max[g] = v.min(), v.max()

    # vertex/edge decoration pattern in doubled indices (decorate:549-559)
    vert = np.array(list(itertools.product((0, 2), repeat=3)))
    edge = np.array([(1, 0, 0), (0, 1, 0), (0, 0, 1), (2, 2, 1),
                     (2, 1, 2), (1, 2, 2), (2, 1, 0), (1, 2, 0),
                     (2, 0, 1), (0, 2, 1), (0, 1, 2), (1, 0, 2)])

    seen = {}
    pos_list, typ_list = [], []

    def sortin(ifeld, typ):
        x = T.T @ ifeld + 0.1 + 2.0 * perkah
        if np.any(x <= 0.0) or np.any(x >= box):
            return
        key = tuple(np.round(x * 10.0).astype(int))
        if key in seen:
            return
        seen[key] = True
        pos_list.append(x)
        # reference remap (sortin:727-729): vertex 0 & edge 1 -> 0,
        # large 2 -> 1
        typ_list.append(0 if typ < 2 else 1)

    for (i, j, k) in itertools.combinations(range(6), 3):
        A = G[[i, j, k]]
        d = np.linalg.det(A)
        if abs(d) < 1e-12:
            continue
        Ainv = np.linalg.inv(A)
        pro = _PROLATE.get((i, j, k))
        others = [l for l in range(6) if l not in (i, j, k)]
        for ks1 in range(k1min[i], k1max[i] + 1):
            for ks2 in range(k1min[j], k1max[j] + 1):
                for ks3 in range(k1min[k], k1max[k] + 1):
                    rhs = np.array([ks1 + gam[i], ks2 + gam[j],
                                    ks3 + gam[k]])
                    x = Ainv @ rhs
                    if np.any(x < lmin) or np.any(x > lmax):
                        continue
                    kf = np.zeros(6, int)
                    kf[i], kf[j], kf[k] = ks1, ks2, ks3
                    for l in others:
                        kf[l] = math.ceil(G[l] @ x - gam[l])
                    base = 2 * kf
                    for v in vert:
                        f = base.copy()
                        f[[i, j, k]] = base[[i, j, k]] + v
                        sortin(f, 0)
                    for e in edge:
                        f = base.copy()
                        f[[i, j, k]] = base[[i, j, k]] + e
                        sortin(f, 1)
                    if pro is not None:
                        for off in pro:
                            sortin(base + np.asarray(off), 2)

    pos = np.asarray(pos_list) * scale
    typ = np.asarray(typ_list, np.int32)
    return pos, typ, box * scale
