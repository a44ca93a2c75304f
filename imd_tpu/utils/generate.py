"""Internal lattice generators (imd_generate.c, imd_qc.c).

The reference generates start configurations when ``coordname`` starts with
an underscore: `_fcc`, `_nacl`, `_hex`, `_bcc` (via cubic generators), etc.
(generate_atoms, imd_generate.c:51).  Positions are produced host-side as
NumPy arrays; callers bin them into a Scene.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def fcc(box_param: Tuple[int, int, int], alat: float,
        ntypes: int = 1) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FCC lattice: box_param cubic unit cells of lattice constant alat.

    Returns (pos [N,3], type [N], box_diag [3]).  For ntypes == 2 the two
    sublattices alternate as in the reference's NaCl option
    (generate_fcc, imd_generate.c:370).
    """
    nx, ny, nz = box_param
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                      [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing="ij"), axis=-1).reshape(-1, 3)
    pos = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * alat
    n = pos.shape[0]
    if ntypes >= 2:
        # alternate types on the two interpenetrating sc sublattices (NaCl)
        s = (cells[:, None, 0] * 0 + np.arange(4)[None, :]) % 2
        typ = s.reshape(-1).astype(np.int32)
    else:
        typ = np.zeros(n, np.int32)
    box = np.array([nx, ny, nz], np.float64) * alat
    return pos, typ, box


def bcc(box_param: Tuple[int, int, int], alat: float
        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    nx, ny, nz = box_param
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing="ij"), axis=-1).reshape(-1, 3)
    pos = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * alat
    typ = np.zeros(pos.shape[0], np.int32)
    box = np.array([nx, ny, nz], np.float64) * alat
    return pos, typ, box


def generate_atoms(coordname: str, box_param, box_unit: float, ntypes: int = 1):
    """Dispatch on the reference's `_name` convention (imd_generate.c:51)."""
    name = coordname.lstrip("_").lower()
    if name in ("fcc", "nacl"):
        return fcc(box_param, box_unit, ntypes if name == "nacl" else 1)
    if name == "bcc" or name == "cscl":
        return bcc(box_param, box_unit)
    raise ValueError(f"unknown internal lattice '{coordname}'")
