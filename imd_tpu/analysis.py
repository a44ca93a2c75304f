"""In-situ structure analysis (L10 plugins of the reference).

- `common_neighbor_analysis` (imd_cna.c:32-460): per-bond CNA triplets
  (n_common, n_bonds, longest_chain) via the classic algorithm including
  the bond-chain ("domino") walk, classifying fcc / hcp / bcc / other;
- `ackland_jones` (imd_ada.c:25-470): angular-distribution
  classification after Ackland & Jones, PRB 73, 054104 (2006);
- `msqd` (imd_correl.c): per-(v)type mean squared displacement;
- `temp_profile` (imd_transport.c write_temp_dist): kinetic-temperature
  histogram along x for the NVX heat-flux setup.

Design note: these are observables computed at output intervals, not
per-step device code; like the reference's SWIG/Python tooling layer
(SURVEY.md §2.7) they run host-side on NumPy (+ scipy.spatial for the
neighbor search), operating on a Scene snapshot.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

CNA_OTHER, CNA_FCC, CNA_HCP, CNA_BCC, CNA_ICO = 0, 1, 2, 3, 4
AJ_NAMES = {0: "other", 1: "fcc", 2: "hcp", 3: "bcc", 4: "ico"}


def _scene_atoms(scene):
    flat = scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    return (np.asarray(flat["pos"])[m], np.asarray(flat["mom"])[m],
            np.asarray(flat["mass"])[m], np.asarray(flat["vtype"])[m],
            np.asarray(flat["id"])[m])


def _neighbor_pairs(pos, box_diag, pbc, r_cut):
    """(i, j, dr) half pairs within r_cut via a periodic KD-tree."""
    from scipy.spatial import cKDTree
    pbc_b = np.asarray(pbc, bool)
    if pbc_b.any():
        bs = np.where(pbc_b, box_diag, 1e6 * box_diag.max())
        tree = cKDTree(np.mod(pos, bs), boxsize=bs)
    else:
        tree = cKDTree(pos)
    pairs = tree.query_pairs(r_cut, output_type="ndarray")
    d = pos[pairs[:, 1]] - pos[pairs[:, 0]]
    for ax in range(3):
        if pbc_b[ax]:
            d[:, ax] -= box_diag[ax] * np.round(d[:, ax] / box_diag[ax])
    return pairs[:, 0], pairs[:, 1], d


def _adjacency(n, i, j):
    """Neighbor lists as a padded [n, kmax] array."""
    cnt = np.zeros(n, np.int32)
    np.add.at(cnt, i, 1)
    np.add.at(cnt, j, 1)
    kmax = int(cnt.max()) if n else 0
    adj = np.full((n, kmax), -1, np.int32)
    fill = np.zeros(n, np.int32)
    for a, b in ((i, j), (j, i)):
        for t in range(len(a)):
            adj[a[t], fill[a[t]]] = b[t]
            fill[a[t]] += 1
    return adj, cnt


def _longest_chain(bonds):
    """Longest path ('domino' chain, imd_cna.c:300-420) among common-
    neighbor bonds given as a set of (a, b) index tuples."""
    if not bonds:
        return 0
    adj: Dict[int, list] = {}
    for a, b in bonds:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    best = 0

    def dfs(node, used, length):
        nonlocal best
        best = max(best, length)
        for nxt in adj.get(node, ()):
            e = (min(node, nxt), max(node, nxt))
            if e not in used:
                used.add(e)
                dfs(nxt, used, length + 1)
                used.remove(e)

    for a, b in bonds:
        dfs(a, {(min(a, b), max(a, b))}, 1)
        dfs(b, {(min(a, b), max(a, b))}, 1)
    return best


def common_neighbor_analysis(scene, r_cut: float) -> np.ndarray:
    """Per-atom CNA class (imd_cna.c).  Signatures: fcc = 12x(4,2,1),
    hcp = 6x(4,2,1)+6x(4,2,2), bcc = 6x(4,4,4... ) i.e. 8x(6,6,6) with
    the second shell; use the standard r_cut between 1st/2nd shell for
    fcc/hcp and between 2nd/3rd for bcc."""
    pos, _, _, _, _ = _scene_atoms(scene)
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    n = len(pos)
    i, j, _ = _neighbor_pairs(pos, box_diag, scene.grid.box.pbc, r_cut)
    neigh = [set() for _ in range(n)]
    for a, b in zip(i, j):
        neigh[a].add(int(b))
        neigh[b].add(int(a))

    out = np.zeros(n, np.int32)
    for a in range(n):
        sigs = []
        for b in neigh[a]:
            common = neigh[a] & neigh[b]
            ncn = len(common)
            bonds = [(c, d) for c in common for d in common
                     if c < d and d in neigh[c]]
            sigs.append((ncn, len(bonds), _longest_chain(bonds)))
        c421 = sigs.count((4, 2, 1))
        c422 = sigs.count((4, 2, 2))
        c444 = sigs.count((4, 4, 4))
        c666 = sigs.count((6, 6, 6))
        if c421 == 12 and len(sigs) == 12:
            out[a] = CNA_FCC
        elif c421 == 6 and c422 == 6 and len(sigs) == 12:
            out[a] = CNA_HCP
        elif c444 == 6 and c666 == 8 and len(sigs) == 14:
            out[a] = CNA_BCC
    return out


def ackland_jones(scene, r_cut: Optional[float] = None) -> np.ndarray:
    """Per-atom Ackland-Jones class (imd_ada.c; PRB 73, 054104 (2006)).

    Uses the adaptive cutoff 1.45 * r0 with r0^2 the mean of the six
    smallest squared neighbor distances, then the chi angular histogram
    and the published decision tree.
    """
    pos, _, _, _, _ = _scene_atoms(scene)
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    n = len(pos)
    # generous candidate search
    guess = r_cut if r_cut else 1.6 * (np.prod(box_diag) / max(n, 1)) ** (1 / 3)
    i, j, d = _neighbor_pairs(pos, box_diag, scene.grid.box.pbc,
                              guess * 1.6)
    r2 = np.sum(d * d, 1)
    # collect neighbors per atom
    nb: list = [[] for _ in range(n)]
    for a, b, dd, rr in zip(i, j, d, r2):
        nb[a].append((rr, dd))
        nb[b].append((rr, -dd))

    out = np.zeros(n, np.int32)
    for a in range(n):
        if len(nb[a]) < 6:
            continue
        arr = sorted(nb[a], key=lambda t: t[0])
        r0_sq = np.mean([t[0] for t in arr[:6]])
        rcut2 = 1.45 * r0_sq       # (1.204 r0)^2 ~ 1.45 r0^2 (AJ eq. 5)
        vecs = np.array([t[1] for t in arr if t[0] <= rcut2])
        n0 = len(vecs)
        u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cosg = (u @ u.T)[np.triu_indices(n0, 1)]
        edges = [-1.01, -0.945, -0.915, -0.755, -0.195, 0.195, 0.245,
                 0.795, 1.01]
        chi, _ = np.histogram(cosg, bins=edges)
        denom = chi[5] + chi[6] + chi[7] - chi[4]
        d_bcc = 0.35 * chi[4] / denom if denom > 0 else 100.0
        d_cp = abs(1.0 - chi[6] / 24.0)
        d_fcc = 0.61 * (abs(chi[0] + chi[1] - 6) + chi[2]) / 6.0
        d_hcp = (abs(chi[0] - 3)
                 + abs(chi[0] + chi[1] + chi[2] + chi[3] - 9)) / 12.0
        if chi[0] == 7:
            d_bcc = 0.0
        elif chi[0] == 6:
            d_fcc = 0.0
        elif chi[0] <= 3:
            d_hcp = 0.0
        # decision tree (AJ 2006, Fig. 6 / imd_ada.c:120-210)
        if chi[7] > 0:
            out[a] = CNA_OTHER
        elif chi[4] < 3:
            out[a] = CNA_ICO if 11 <= n0 <= 13 else CNA_OTHER
        elif d_bcc <= d_cp:
            out[a] = CNA_BCC if n0 >= 11 else CNA_OTHER
        elif n0 not in (11, 12):
            out[a] = CNA_OTHER
        else:
            out[a] = CNA_HCP if d_hcp < d_fcc else CNA_FCC
    return out


def msqd(scene, ref_pos_by_id: np.ndarray, vtypes: int = 1) -> np.ndarray:
    """Per-vtype mean squared displacement (imd_correl.c / .msqd file).

    ``ref_pos_by_id`` [n_ids, 3]: reference positions indexed by atom id.
    """
    pos, _, _, vt, ids = _scene_atoms(scene)
    d = pos - ref_pos_by_id[ids]
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    for ax in range(3):
        if scene.grid.box.pbc[ax]:
            d[:, ax] -= box_diag[ax] * np.round(d[:, ax] / box_diag[ax])
    d2 = np.sum(d * d, 1)
    out = np.zeros(vtypes)
    for t in range(vtypes):
        m = vt == t
        out[t] = d2[m].mean() if m.any() else 0.0
    return out


def temp_profile(scene, n_bins: int) -> np.ndarray:
    """Kinetic temperature profile along x (imd_transport.c
    write_temp_dist): [n_bins] in eV, COM drift per bin removed."""
    pos, mom, mass, _, _ = _scene_atoms(scene)
    bx = float(np.asarray(scene.grid.box.h)[0, 0])
    b = np.clip((pos[:, 0] / bx * n_bins).astype(int), 0, n_bins - 1)
    out = np.zeros(n_bins)
    for k in range(n_bins):
        m = b == k
        if m.sum() == 0:
            continue
        p = mom[m]
        ma = mass[m][:, None]
        v = p / ma
        vcom = p.sum(0) / mass[m].sum()
        out[k] = (mass[m] * ((v - vcom) ** 2).sum(1)).sum() / (3.0 * m.sum())
    return out


# ---------------------------------------------------------------------------
# van Hove self-correlation (imd_correl.c:140-268)
# ---------------------------------------------------------------------------

def van_hove_self(scene, ref_pos_by_id: np.ndarray, n_r: int, dr: float,
                  ntypes: int = 1) -> np.ndarray:
    """G_s(r) histogram per type relative to reference positions
    (correlate, imd_correl.c:140; GS[type][t][r] for one t-slice).

    ``ref_pos_by_id``: [max_id+1, 3] positions at the reference step
    (indexed by atom id, like REF_POS).  Displacements are reduced into
    the periodic box (reduce_displacement).  Returns [ntypes, n_r]
    integer counts; dr is the bin width (1/inv_dr).
    """
    pos, _, _, vt, ids = _scene_atoms(scene)
    typ = np.asarray(scene.flatten_atoms()["type"])[
        np.asarray(scene.flatten_atoms()["mask"])]
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    d = pos - ref_pos_by_id[ids]
    pbc_b = np.asarray(scene.grid.box.pbc, bool)
    for ax in range(3):
        if pbc_b[ax]:
            d[:, ax] -= box_diag[ax] * np.round(d[:, ax] / box_diag[ax])
    r = np.linalg.norm(d, axis=-1)
    idx = np.minimum((r / dr).astype(np.int64), n_r - 1)
    out = np.zeros((ntypes, n_r), np.int64)
    np.add.at(out, (np.minimum(typ, ntypes - 1), idx), 1)
    return out


# ---------------------------------------------------------------------------
# ATDIST: time-averaged atom-position distribution (imd_distrib.c:863-1010)
# ---------------------------------------------------------------------------

class AtDist:
    """Accumulated per-type density histogram over a (possibly rotated)
    window, with periodic images (update_atdist, imd_distrib.c:905).

    ll/ur: window corners; dims: bin counts; phi: rotation of x-y
    coordinates before binning; per_ll/per_ur: range of periodic images
    added along each box vector.
    """

    def __init__(self, ll, ur, dims, ntypes=1, phi=0.0,
                 per_ll=(0, 0, 0), per_ur=(0, 0, 0)):
        self.ll = np.asarray(ll, float)
        self.ur = np.asarray(ur, float)
        self.dims = tuple(int(v) for v in dims)
        self.ntypes = ntypes
        self.phi = phi
        self.per_ll = tuple(int(v) for v in per_ll)
        self.per_ur = tuple(int(v) for v in per_ur)
        self.hist = np.zeros((ntypes,) + self.dims, np.float32)
        self.scale = np.asarray(self.dims) / (self.ur - self.ll)

    def update(self, scene) -> None:
        pos, _, _, _, _ = _scene_atoms(scene)
        typ = np.asarray(scene.flatten_atoms()["type"])[
            np.asarray(scene.flatten_atoms()["mask"])]
        h = np.asarray(scene.grid.box.h)
        co, si = np.cos(self.phi), np.sin(self.phi)
        for ix in range(self.per_ll[0], self.per_ur[0] + 1):
            for iy in range(self.per_ll[1], self.per_ur[1] + 1):
                for iz in range(self.per_ll[2], self.per_ur[2] + 1):
                    p = pos + ix * h[:, 0] + iy * h[:, 1] + iz * h[:, 2]
                    x = co * p[:, 0] + si * p[:, 1]
                    y = -si * p[:, 0] + co * p[:, 1]
                    q = np.stack([x, y, p[:, 2]], -1)
                    inside = ((q >= self.ll) & (q <= self.ur)).all(-1)
                    if not inside.any():
                        continue
                    b = ((q[inside] - self.ll) * self.scale).astype(int)
                    b = np.clip(b, 0, np.asarray(self.dims) - 1)
                    np.add.at(self.hist,
                              (np.minimum(typ[inside], self.ntypes - 1),
                               b[:, 0], b[:, 1], b[:, 2]), 1.0)

    def write(self, path: str) -> None:
        """Binary blocked format like write_atdist (imd_distrib.c:1012)."""
        with open(path, "wb") as f:
            hdr = (f"#F L 3 0 {self.ntypes}\n#C atoms_dist\n"
                   f"#D {self.dims[0]} {self.dims[1]} {self.dims[2]}\n"
                   f"#S {1.0/self.scale[0]:e} {1.0/self.scale[1]:e} "
                   f"{1.0/self.scale[2]:e}\n#E\n")
            f.write(hdr.encode())
            np.moveaxis(self.hist, 0, -1).astype("<f4").tofile(f)


# ---------------------------------------------------------------------------
# DIFFPAT: accumulated diffraction pattern (imd_distrib.c:1061-1260)
# ---------------------------------------------------------------------------

class DiffPat:
    """|FFT(density)|^2 accumulator (update_diffpat, imd_distrib.c:1136):
    atoms are binned (weighted per type) into a density grid; every
    ``interval`` updates the grid is Fourier transformed, the squared
    modulus added to the pattern, and the grid cleared."""

    def __init__(self, ll, ur, dims, weights, interval=1):
        self.ll = np.asarray(ll, float)
        self.ur = np.asarray(ur, float)
        self.dims = tuple(int(v) for v in dims)
        self.weights = np.asarray(weights, float)
        self.interval = max(int(interval), 1)
        self.scale = np.asarray(self.dims) / (self.ur - self.ll)
        self.dist = np.zeros(self.dims, np.float32)
        self.pattern = np.zeros(self.dims[:2] + (self.dims[2] // 2 + 1,),
                                np.float32)
        self._count = 0

    def update(self, scene) -> None:
        pos, _, _, _, _ = _scene_atoms(scene)
        typ = np.asarray(scene.flatten_atoms()["type"])[
            np.asarray(scene.flatten_atoms()["mask"])]
        inside = ((pos >= self.ll) & (pos <= self.ur)).all(-1)
        b = ((pos[inside] - self.ll) * self.scale).astype(int)
        b = np.clip(b, 0, np.asarray(self.dims) - 1)
        w = self.weights[np.minimum(typ[inside], len(self.weights) - 1)]
        np.add.at(self.dist, (b[:, 0], b[:, 1], b[:, 2]), w)
        self._count += 1
        if self._count % self.interval == 0:
            F = np.fft.rfftn(self.dist)
            self.pattern += (F.real ** 2 + F.imag ** 2).astype(np.float32)
            self.dist[:] = 0.0

    def k_steps(self):
        """Reciprocal bin widths 2 pi scale / dim (write_diffpat)."""
        return 2.0 * np.pi * self.scale / np.asarray(self.dims)


# ---------------------------------------------------------------------------
# Nye tensor dislocation analysis (imd_nyeTensorAnalysis_3d.c)
# ---------------------------------------------------------------------------

def fcc_reference_vectors(alat: float) -> np.ndarray:
    """The 12 fcc nearest-neighbor vectors (init_NyeTensor analog)."""
    half = alat / 2.0
    v = []
    for a in range(3):
        b, c = (a + 1) % 3, (a + 2) % 3
        for sb in (-1, 1):
            for sc in (-1, 1):
                vec = [0.0, 0.0, 0.0]
                vec[b], vec[c] = sb * half, sc * half
                v.append(vec)
    return np.asarray(v)


def bcc_reference_vectors(alat: float) -> np.ndarray:
    """8 nearest + 6 second-shell bcc vectors (neighPerf[14])."""
    h = alat / 2.0
    v = [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1)
         for sz in (-1, 1)]
    for ax in range(3):
        for s in (-1, 1):
            vec = [0.0, 0.0, 0.0]
            vec[ax] = s * alat
            v.append(vec)
    return np.asarray(v)


def nye_tensor(scene, ref_vectors: np.ndarray, r_cut: float,
               angle_cos: float = 0.9396926207859084):
    """Per-atom Nye tensor alpha (calculateLcm/calculateNye,
    imd_nyeTensorAnalysis_3d.c:237/300; Hartley & Mishin, Acta Mater 53).

    Two passes: (1) lattice-correspondence matrix per atom from
    least-squares matching of neighbor vectors to ``ref_vectors``
    (matches accepted within 20 deg); (2) spatial gradient of the LCM
    over neighbors, assembled into alpha = -curl(LCM).
    Returns (alpha [n,3,3], lcm [n,3,3]).
    """
    pos, _, _, _, _ = _scene_atoms(scene)
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    n = len(pos)
    i, j, d = _neighbor_pairs(pos, box_diag, scene.grid.box.pbc, r_cut)
    # full (directed) pair list
    ii = np.concatenate([i, j])
    jj = np.concatenate([j, i])
    dd = np.concatenate([d, -d])

    # pass 1: match neighbor vectors to reference vectors
    lref = np.linalg.norm(ref_vectors, axis=-1)
    l = np.linalg.norm(dd, axis=-1)
    cosang = (dd @ ref_vectors.T) / np.maximum(l[:, None] * lref, 1e-30)
    best = np.argmax(cosang, -1)
    ok = cosang[np.arange(len(dd)), best] > angle_cos
    perf = ref_vectors[best]
    A = np.zeros((n, 3, 3))
    B = np.zeros((n, 3, 3))
    np.add.at(A, ii[ok], dd[ok, :, None] * perf[ok, None, :])
    np.add.at(B, ii[ok], dd[ok, :, None] * dd[ok, None, :])
    lcm = np.tile(np.eye(3), (n, 1, 1))
    dets = np.abs(np.linalg.det(A)) > 1e-12
    lcm[dets] = np.linalg.solve(A[dets], B[dets])

    # pass 2: gradient of each lcm component over all neighbors
    A2 = np.zeros((n, 3, 3))
    np.add.at(A2, ii, dd[:, :, None] * dd[:, None, :])
    de = lcm[jj] - lcm[ii]                       # [pairs, 3, 3]
    C = np.zeros((n, 3, 3, 3))                   # [n, i, j, axis]
    np.add.at(C, ii, de[:, :, :, None] * dd[:, None, None, :])
    ok2 = np.abs(np.linalg.det(A2)) > 1e-12
    grd = np.zeros((n, 3, 3, 3))
    if ok2.any():
        # solve A2[n] g = C[n,i,j] for every component pair
        grd[ok2] = np.linalg.solve(
            A2[ok2, None, None, :, :],
            C[ok2][..., None])[..., 0]
    alpha = np.zeros((n, 3, 3))
    alpha[:, 0, :] = -grd[:, 2, :, 1] + grd[:, 1, :, 2]
    alpha[:, 1, :] = -grd[:, 0, :, 2] + grd[:, 2, :, 0]
    alpha[:, 2, :] = -grd[:, 1, :, 0] + grd[:, 0, :, 1]
    return alpha, lcm


# ---------------------------------------------------------------------------
# Heat current (imd_transport.c:32-112, do_heat_cond) and defect distance
# (imd_ada.c:300-349, hopsToDefect)
# ---------------------------------------------------------------------------

class HeatCurrent:
    """Green-Kubo microscopic heat-current accumulator (do_heat_cond).

    Usage mirrors the reference's hc_av_start/hc_start window: call
    `update(scene, res, step)` each step with a ForceResult computed with
    per_atom_stress=True.  Steps in [av_start, start) accumulate each
    atom's average energy and the average temperature; steps >= start
    yield the scaled heat current J = fac * sum_i [p_i (e_i - <e_i>) +
    0.5 sigma_i p_i] / m_i with fac = 1/(sqrt(V) T)
    (imd_transport.c:67-111).
    """

    def __init__(self, av_start: int, start: int, timestep: float,
                 volume: float):
        if start <= av_start:
            raise ValueError("hc_start must be > hc_av_start")
        self.av_start, self.start = av_start, start
        self.dt, self.volume = timestep, volume
        self.avg_eng = None       # by atom id
        self.fac_sum = 0.0
        self.fac = None

    def _per_atom(self, scene, res):
        flat = scene.flatten_atoms()
        m = np.asarray(flat["mask"])
        ids = np.asarray(flat["id"])[m]
        mom = np.asarray(flat["mom"])[m]
        mass = np.asarray(flat["mass"])[m]
        force = np.asarray(flat["force"])[m]
        epot = np.asarray(flat["epot"])[m]
        pt = np.asarray(res.presstens_atom).reshape(-1, 6)[m.reshape(-1)]
        pp = mom + 0.5 * self.dt * force    # momenta at force time
        ekin = np.sum(pp * pp, 1) / (2.0 * mass)
        return ids, pp, mass, ekin, ekin + epot, pt

    def update(self, scene, res, step: int):
        """Returns J [3] for step >= hc_start, else None."""
        if res.presstens_atom is None:
            raise ValueError("need compute_*_forces(per_atom_stress=True)")
        ids, pp, mass, ekin, e, pt = self._per_atom(scene, res)
        # avg_eng is indexed by atom id (may be sparse/non-contiguous);
        # the temperature normalization uses the ALIVE atom count, like
        # the reference's `natoms` (imd_transport.c:84).
        n_ids = int(ids.max()) + 1
        n_alive = len(ids)
        if self.avg_eng is None:
            self.avg_eng = np.zeros(n_ids)
        if step < self.start:
            if step >= self.av_start:
                ae = np.zeros(n_ids)
                ae[ids] = e
                self.avg_eng += ae
                self.fac_sum += float(ekin.sum())
            return None
        if self.fac is None:
            window = self.start - self.av_start
            self.avg_eng /= window
            temp = 2.0 * self.fac_sum / (3.0 * n_alive * window)
            self.fac = 1.0 / (math.sqrt(self.volume) * temp)
        de = e - self.avg_eng[ids]
        # sigma . p with Voigt order xx yy zz yz zx xy
        sx = pt[:, 0] * pp[:, 0] + pt[:, 5] * pp[:, 1] + pt[:, 4] * pp[:, 2]
        sy = pt[:, 5] * pp[:, 0] + pt[:, 1] * pp[:, 1] + pt[:, 3] * pp[:, 2]
        sz = pt[:, 4] * pp[:, 0] + pt[:, 3] * pp[:, 1] + pt[:, 2] * pp[:, 2]
        sv = np.stack([sx, sy, sz], 1)
        J = np.sum((pp * de[:, None] + 0.5 * sv) / mass[:, None], 0)
        return self.fac * J


def hops_to_defect(scene, defect_mask: np.ndarray, r_cut: float,
                   rounds: int = 3) -> np.ndarray:
    """Bond-graph distance to the nearest defect atom, capped at
    ``rounds`` (imd_ada.c:300-349: 127 = farther than `rounds` hops).

    ``defect_mask`` is per alive atom (e.g. ackland_jones(...) != fcc
    class); returns per alive atom hop counts (0 = defect itself).
    """
    pos, _, _, _, _ = _scene_atoms(scene)
    box_diag = np.abs(np.diag(np.asarray(scene.grid.box.h)))
    i, j, _ = _neighbor_pairs(pos, box_diag, scene.grid.box.pbc, r_cut)
    hops = np.where(np.asarray(defect_mask), 0, 127).astype(np.int32)
    for h in range(rounds):
        front = hops == h
        touch_j = front[i]
        touch_i = front[j]
        upd = np.zeros(len(pos), bool)
        upd[j[touch_j]] = True
        upd[i[touch_i]] = True
        hops = np.where(upd & (hops > h + 1), h + 1, hops)
    return hops


def local_order(scene, alat: float, r_cut: float,
                lodnorm: Optional[float] = None) -> np.ndarray:
    """Per-atom local order parameter (LOD, imd_forces.c:61-140):
    LOD_i = |sum_q sum_j exp(i q . d_ij)| over the fcc wavevectors
    q = (4 pi / alat) {100, 010, 001}, neighbors within r_cut.  On a
    perfect fcc lattice every nearest neighbor contributes e^{i 2 pi} =
    1 per q (maximal order); in a disordered melt the phases cancel.
    Normalized by ``lodnorm`` (default 3 * 12, the perfect-fcc value).
    """
    pos, _, _, _, ids = _scene_atoms(scene)
    box_diag = np.abs(np.diag(np.asarray(scene.grid.box.h)))
    i, j, d = _neighbor_pairs(pos, box_diag, scene.grid.box.pbc, r_cut)
    qfac = 4.0 * np.pi / alat
    acc = np.zeros(len(pos), np.complex128)
    for q in (np.array([qfac, 0, 0]), np.array([0, qfac, 0]),
              np.array([0, 0, qfac])):
        ph = np.exp(1j * (d @ q))
        np.add.at(acc, i, ph)
        np.add.at(acc, j, np.conj(ph))
    if lodnorm is None:
        lodnorm = 3.0 * 12.0
    return np.abs(acc) / lodnorm
