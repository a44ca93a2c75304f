"""Potential table round-trip and interpolation accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models.potential import (
    PotTable, lj_table, morse_table, read_pot_table, write_pot_table, POT_TAIL)


def test_lj_table_matches_analytic():
    eps, sig, rc = 0.3, 2.5, 6.0
    pt = lj_table(eps, sig, rc, res=4000, dtype=jnp.float64)
    r = np.linspace(0.8 * sig, (1 - POT_TAIL - 0.01) * rc, 200)
    val, grad = pt.interp(0, jnp.asarray(r * r))
    s6 = (sig / r) ** 6
    v_ref = eps * (s6 * s6 - 2 * s6)
    # table is shifted for the smooth tail: compare differences
    shift = float(val[0] - v_ref[0])
    np.testing.assert_allclose(np.asarray(val) - shift, v_ref, atol=1e-6)
    # grad = (1/r) dV/dr
    dv_dr = -12 * eps / r * (s6 * s6 - s6)
    np.testing.assert_allclose(np.asarray(grad), dv_dr / r, rtol=2e-3, atol=1e-4)


def test_lj_table_smooth_at_cutoff():
    pt = lj_table(1.0, 1.0, 2.5, res=2000, dtype=jnp.float64)
    r2c = 2.5 ** 2
    val, grad = pt.interp(0, jnp.asarray([r2c * 0.999, r2c]))
    assert abs(float(val[1])) < 1e-8
    assert abs(float(val[0])) < 1e-4
    assert abs(float(grad[1])) < 1e-3


def test_short_distance_clamps():
    pt = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    v_begin, _ = pt.interp(0, pt.begin[0])
    v_short, _ = pt.interp(0, jnp.asarray(0.5 * float(pt.begin[0])))
    assert np.isfinite(float(v_short))
    np.testing.assert_allclose(float(v_short), float(v_begin), rtol=1e-12)


def test_format2_roundtrip(tmp_path):
    pt = lj_table([1.0, 0.5, 0.8], [1.0, 1.1, 1.2], [2.5, 2.6, 2.8],
                  ntypes=2, dtype=jnp.float64)
    path = tmp_path / "pot2.dat"
    write_pot_table(pt, str(path))
    pt2 = read_pot_table(str(path), ncols=4, dtype=jnp.float64)
    r2 = jnp.linspace(float(pt.begin[0]) * 1.01, 2.4 ** 2, 50)
    for col in range(4):
        v1, g1 = pt.interp(col, r2)
        v2, g2 = pt2.interp(col, r2)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9,
                                   atol=1e-12)


def test_format1_parse():
    # minimal format-1 file: equidistant r^2, one column, shifted to zero
    r2 = np.linspace(1.0, 9.0, 33)
    v = 1.0 / r2
    lines = ["#F 1 1", "#E"]
    for x, y in zip(r2, v):
        lines.append(f"{x:.10f} {y:.10f}")
    pt = read_pot_table("\n".join(lines) + "\n", ncols=1, dtype=jnp.float64)
    val, _ = pt.interp(0, jnp.asarray([4.0]))
    np.testing.assert_allclose(float(val[0]), 1 / 4.0 - 1 / 9.0, rtol=1e-6)
    # value at cutoff is zero after shift
    val_c, _ = pt.interp(0, jnp.asarray([9.0]))
    assert abs(float(val_c[0])) < 1e-10


def test_vector_cols():
    pt = lj_table([1.0, 0.5, 0.8], [1.0, 1.1, 1.2], [2.5, 2.5, 2.5],
                  ntypes=2, dtype=jnp.float64)
    r2 = jnp.full((4,), 2.0)
    cols = jnp.asarray([0, 1, 2, 3])
    v, g = pt.interp(cols, r2)
    for i in range(4):
        vi, gi = pt.interp(i, jnp.asarray(2.0))
        np.testing.assert_allclose(float(v[i]), float(vi), rtol=1e-12)
        np.testing.assert_allclose(float(g[i]), float(gi), rtol=1e-12)


def test_chebyshev_matches_table():
    import jax
    from imd_tpu.models.potential import to_chebyshev, analytic_eam, eam_to_chebyshev
    # fit quality is floored by the source table's own discretization
    # (quadratic-interp wiggle ~ 1e-5 at res 4000 in the steep region)
    pt = lj_table(1.0, 1.0, 2.5, res=4000, dtype=jnp.float64)
    cp = to_chebyshev(pt, deg=28)
    assert max(cp.max_err) < 2e-5, cp.max_err
    # compare inside the fit window (below it the Chebyshev continues
    # linearly instead of following the 1e12 hard core)
    r2 = jnp.linspace(float(cp.begin[0]) * 1.001, 2.5 ** 2, 500)
    v1, g1 = pt.interp(0, r2)
    v2, g2 = cp.interp(0, r2)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=2e-3, rtol=2e-3)
    # below the window: linear continuation => constant repulsive gradient
    xlow = jnp.asarray([0.3, 0.6]) * float(cp.begin[0])
    _, g_short = cp.interp(0, xlow)
    assert float(g_short[0]) == float(g_short[1]) < 0.0
    # EAM set: embed max_err is dominated by the source table's own
    # wiggle at rho -> 0 (sqrt cusp); verify accuracy where physics lives
    eam = analytic_eam(dtype=jnp.float64)
    ceam = eam_to_chebyshev(eam, deg=24)
    assert max(ceam.pair.max_err) < 1e-4
    assert max(ceam.rho.max_err) < 1e-4
    rho = jnp.linspace(1.0, 40.0, 200)
    fe, _ = ceam.embed.interp(0, rho)
    ref = -3.39 * np.sqrt(np.asarray(rho) / 12.0)
    np.testing.assert_allclose(np.asarray(fe), ref, rtol=1e-4, atol=1e-4)


def test_chebyshev_vector_cols():
    from imd_tpu.models.potential import to_chebyshev
    pt = lj_table([1.0, 0.5, 0.8], [1.0, 1.1, 1.2], [2.5, 2.5, 2.5],
                  ntypes=2, dtype=jnp.float64)
    cp = to_chebyshev(pt, deg=24)
    r2 = jnp.full((4,), 2.0)
    cols = jnp.asarray([0, 1, 2, 3])
    v, g = cp.interp(cols, r2)
    for i in range(4):
        vi, gi = cp.interp(i, jnp.asarray(2.0))
        np.testing.assert_allclose(float(v[i]), float(vi), rtol=1e-12)
        np.testing.assert_allclose(float(g[i]), float(gi), rtol=1e-12)


# ---------------------------------------------------------------------------
# FOURPOINT / SPLINE interpolation modes (potaccess.h:23-35)
# ---------------------------------------------------------------------------

def _lj_ref(eps, sig, r):
    s6 = (sig / r) ** 6
    v = eps * (s6 * s6 - 2 * s6)
    g = -12 * eps / (r * r) * (s6 * s6 - s6)   # 2 dV/dr^2 = (1/r) dV/dr
    return v, g


@pytest.mark.parametrize("mode", ["4point", "spline"])
def test_alt_interp_matches_analytic(mode):
    from imd_tpu.models.potential import with_interpolation
    eps, sig, rc = 0.3, 2.5, 6.0
    pt = lj_table(eps, sig, rc, res=4000, dtype=jnp.float64)
    wrapped = with_interpolation(pt, mode)
    r = np.linspace(0.9 * sig, (1 - POT_TAIL - 0.01) * rc, 173)
    val, grad = wrapped.interp(0, jnp.asarray(r * r))
    v_ref, g_ref = _lj_ref(eps, sig, r)
    shift = float(val[0] - v_ref[0])
    np.testing.assert_allclose(np.asarray(val) - shift, v_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(grad), g_ref, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("mode", ["4point", "spline"])
def test_alt_interp_grad_consistent_with_value(mode):
    """The returned grad must be 2*d(val)/dx of the interpolant itself."""
    from imd_tpu.models.potential import with_interpolation
    pt = lj_table(0.3, 2.5, 6.0, res=1000, dtype=jnp.float64)
    wrapped = with_interpolation(pt, mode)
    x = np.linspace(7.0, 30.0, 211)
    h = 1e-6
    vp = np.asarray(wrapped.interp(0, jnp.asarray(x + h))[0])
    vm = np.asarray(wrapped.interp(0, jnp.asarray(x - h))[0])
    grad = np.asarray(wrapped.interp(0, jnp.asarray(x))[1])
    fd = 2.0 * (vp - vm) / (2 * h)
    np.testing.assert_allclose(grad, fd, rtol=5e-4, atol=1e-6)


def test_alt_interp_beats_3point_on_smooth_function():
    """Cubic/spline should track a smooth table more closely than the
    quadratic default at equal sampling (the point of the 4point/spline
    builds)."""
    from imd_tpu.models.potential import with_interpolation
    eps, sig, rc = 0.3, 2.5, 6.0
    pt = lj_table(eps, sig, rc, res=300, dtype=jnp.float64)  # coarse
    r = np.linspace(1.05 * sig, (1 - POT_TAIL - 0.02) * rc, 401)
    _, g_ref = _lj_ref(eps, sig, r)
    errs = {}
    for mode in ("3point", "4point", "spline"):
        w = with_interpolation(pt, mode)
        g = np.asarray(w.interp(0, jnp.asarray(r * r))[1])
        errs[mode] = np.max(np.abs(g - g_ref))
    assert errs["4point"] <= errs["3point"]
    assert errs["spline"] <= errs["3point"]


def test_alt_interp_vector_cols_and_short_clamp():
    from imd_tpu.models.potential import with_interpolation
    pt = lj_table([0.3, 0.2, 0.25], [2.5, 2.0, 2.2], [6.0, 5.0, 5.5],
                  ntypes=2, res=800, dtype=jnp.float64)
    for mode in ("4point", "spline"):
        w = with_interpolation(pt, mode)
        cols = jnp.asarray([0, 1, 3])
        x = jnp.asarray([9.0, 8.0, 7.0])
        v, g = w.interp(cols, x)
        for k, c in enumerate([0, 1, 3]):
            vc, gc = w.interp(int(c), x[k])
            np.testing.assert_allclose(float(v[k]), float(vc), rtol=1e-12)
            np.testing.assert_allclose(float(g[k]), float(gc), rtol=1e-12)
        # below-start clamp: flat (zero grad), finite value
        v0, g0 = w.interp(0, jnp.asarray(1e-4))
        assert np.isfinite(float(v0)) and float(g0) == 0.0


def test_pot_interp_tag_parses():
    from imd_tpu.config import SimConfig, parse_param_text
    cfg = SimConfig.from_params(parse_param_text("pot_interp spline\n"))
    assert cfg.pot_interp == "spline"
