"""COLRAD reference-rate bridge (VERDICT r3 #7).

models/colrad_ref.py replicates the reference's defining rate integrals
(Mott cross sections x Fermi-Dirac x Pauli blocking, Sommerfeld mu —
integrand_excitation imd_colrad.c:3464, outer_integrand_ionization2:3629,
chempot imd_ttm.c:3363).  These tests

- ingest the reference's atomic state tables (colrad_read_states
  format, imd_colrad.c:523),
- bound the deviation of the framework's tabulated van-Regemorter/Lotz
  rates from the reference's integrals IN THE REFERENCE'S INTENDED
  REGIME (solid density, Te ~ 2-30 eV),
- pin the reference-side artifact that bounds any closer agreement:
  its Sommerfeld-expansion chemical potential is invalid for
  kTe >> EF, collapsing its own rates at high Te / low density (the
  Maxwellian limit is never reached), and
- exercise build_tables(rates="ref") — the reference's rate physics as
  a drop-in table source.
"""

import numpy as np
import pytest

from imd_tpu import units
from imd_tpu.models import colrad_ref as cr
from imd_tpu.models.colrad import (_k_exc, _k_ion, aluminium_states,
                                   build_tables, read_states)

EV = units.EV_TO_J
K = units.EV_TO_K
NE_SOLID = 1.8e29            # ~3 conduction electrons per Al atom


def test_read_states_reference_format(tmp_path):
    # cumulative energy scale: z1 ground - z0 ground = chi_0
    al0 = [(0, 0, 0.000, 2, 0, 3),
           (1, 0, 3.143, 6, 1, 3),
           (2, 0, 4.085, 2, 0, 4)]
    al1 = [(0, 0, 5.986, 1, 0, 3),
           (1, 0, 10.60, 9, 1, 3)]
    for name, rows in (("Al0_states.txt", al0), ("Al1_states.txt", al1)):
        (tmp_path / name).write_text(
            "\n".join("\t".join(f"{v:.6f}" for v in r) for r in rows)
            + "\n")
    st = read_states(str(tmp_path))
    # 3 z0 levels + 2 z1 levels + bare stage
    assert len(st.z) == 6
    np.testing.assert_array_equal(st.z, [0, 0, 0, 1, 1, 2])
    np.testing.assert_allclose(st.e_ev[:3], [0.0, 3.143, 4.085])
    np.testing.assert_allclose(st.e_ev[3:5], [0.0, 10.60 - 5.986])
    np.testing.assert_allclose(st.g[:5], [2, 6, 2, 1, 9])
    assert st.chi_ev[0] == pytest.approx(5.986)     # ground-to-ground
    assert st.ground[0] == 0 and st.ground[1] == 3 and st.ground[2] == 5


def test_read_states_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_states(str(tmp_path))


def test_ionization_rate_matches_reference_regime():
    """Lotz vs the reference's double integral at solid density: within
    one order of magnitude over Te = 5-30 eV (measured x1.5-x10; the
    tabulated fit is the upper one)."""
    for chi in (6.0, 18.8):
        for te in (5.0, 10.0, 30.0):
            kr = cr.k_ion_ref(NE_SOLID, te * K, chi * EV,
                              n_outer=601, n_inner=151)
            kf = float(_k_ion(chi, np.array([te]))[0])
            assert kr > 0
            assert 1.0 < kf / kr < 11.0, (chi, te, kf / kr)


def test_excitation_rate_offset_documented():
    """van Regemorter (gaunt 0.2) sits a documented factor ~8-25 BELOW
    the reference's Mott integral (alpha_i 0.3) at solid density,
    Te = 2-30 eV — same threshold shape, constant-factor family."""
    for de in (3.0, 10.0):
        for te in (5.0, 10.0, 30.0):
            kr = cr.k_exc_ref(NE_SOLID, te * K, de * EV, n=8001)
            kf = float(_k_exc(de, np.array([te]))[0])
            assert kr > 0
            assert 0.02 < kf / kr < 0.2, (de, te, kf / kr)


def test_reference_mu_artifact_pinned():
    """The reference's Sommerfeld chempot is invalid for kTe >> EF: its
    own rates collapse at high Te instead of approaching the Maxwellian
    limit.  Pin the artifact so the bounded agreement above is read in
    context (this, not the tabulation, is what blocks closer parity
    outside Te ~ 2-30 eV)."""
    k30 = cr.k_exc_ref(NE_SOLID, 30.0 * K, 3.0 * EV, n=8001)
    k100 = cr.k_exc_ref(NE_SOLID, 100.0 * K, 3.0 * EV, n=8001)
    assert k100 < 0.01 * k30        # collapse, not thermal growth
    # and at truly nondegenerate density mu is absurdly negative
    assert cr.chempot(1e26, 5.0 * K) < -100 * EV


def test_build_tables_ref_mode():
    st = aluminium_states(max_z=1, nlev=2)
    tab = build_tables(st, te_lo=1.0, te_hi=50.0, nt=6, rates="ref")
    for arr in (tab.k_exc, tab.k_ion, tab.k_rr):
        a = np.asarray(arr)
        assert np.all(np.isfinite(a)) and np.all(a >= 0)
    assert np.asarray(tab.k_ion).max() > 0
