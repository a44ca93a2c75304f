"""Parameter-tag coverage vs the reference (imd_param.c, 488 unique tags).

The snapshot in data/ref_param_tags.txt was extracted with
    grep -oE "strcasecmp(token, ...)" imd_param.c
Every reference tag must classify as parsed/ignored/unsupported — an
'unknown' classification means a reference param file would hit the
unknown-tag warning for a tag the reference understands (VERDICT r1 #7).
"""

import pathlib
import warnings

import pytest

from imd_tpu.config import SimConfig, parse_param_text, tag_category

TAGS = (pathlib.Path(__file__).parent / "data"
        / "ref_param_tags.txt").read_text().split()


def test_all_reference_tags_classified():
    unknown = [t for t in TAGS if tag_category(t) == "unknown"]
    assert not unknown, f"unclassified reference tags: {unknown}"


def test_parsed_coverage_fraction():
    cats = {t: tag_category(t) for t in TAGS}
    parsed = sum(1 for v in cats.values() if v == "parsed")
    # typed coverage of the full reference tag surface
    assert parsed >= 0.80 * len(TAGS), (
        f"{parsed}/{len(TAGS)} parsed; "
        f"{[t for t, v in cats.items() if v != 'parsed'][:40]}")


def test_generic_sweep_types_and_aliases():
    p = parse_param_text("""
ters_a 1.0 2.0
ters_r_cut 3.0 3.1 3.2
glok_incfac 1.25
glok_minsteps 7
atomic_weight 63.546
neb_nrep 8
cna_int 50
avpos_int 10
ew_kappa 0.3
sm_Z 3.0 4.0
deform_shift 0 0.1 0.0 0.0
deform_shift 1 0.2 0.0 0.0
""")
    cfg = SimConfig.from_params(p)
    assert cfg.ters_a == (1.0, 2.0)
    assert cfg.ters_r_cut == (3.0, 3.1, 3.2)
    assert cfg.relax.fire_incfac == 1.25
    assert cfg.relax.fire_minsteps == 7
    assert cfg.masses == (63.546,)
    assert cfg.neb_nrep == 8
    assert cfg.cna_int == 50
    assert cfg.avpos_int == 10
    assert cfg.ew_kappa == 0.3
    assert cfg.sm_Z == (3.0, 4.0)
    assert len(cfg.deform_shift) == 2


def test_unsupported_tag_warns_unknown_tag_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SimConfig.from_params(parse_param_text("fcs_method fmm\n"))
    assert any("does not implement" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SimConfig.from_params(parse_param_text("totally_bogus_tag 1\n"))
    assert any("unknown parameter tag" in str(x.message) for x in w)


def test_validate_completeness_checks():
    """check_parameters_complete analog (imd_param.c:3746-4070): fatal
    gaps raise with the reference's messages; defaults are filled."""
    def v(txt):
        return SimConfig.from_params(parse_param_text(txt)).validate()

    with pytest.raises(ValueError, match="timestep is missing"):
        v("ensemble nve\nntypes 1\n")
    with pytest.raises(ValueError, match="starttemp is missing"):
        v("ensemble nvt\ntimestep 0.1\nntypes 1\n")
    with pytest.raises(ValueError, match="total_types"):
        v("ensemble nve\ntimestep 0.1\nntypes 1\n"
          "extra_startforce 0 0 0 1\n")
    with pytest.raises(ValueError, match="without axis"):
        v("ensemble nve\ntimestep 0.1\nntypes 1\ntotal_types 3\n"
          "bend_nmoments 1\nbend_axis 0 0 0 0\n"
          "bend_vtype_of_origin 0 1\nbend_vtype_of_force 0 2\n"
          "extra_startbforce 2 0 0 1\n")
    with pytest.raises(ValueError, match="init_t_el"):
        v("ensemble ttm\ntimestep 0.1\nntypes 1\nttmdimx 8\n"
          "fix_t_el 1\nfd_min_atoms 4\n")
    with pytest.raises(ValueError, match="I0"):
        v("ensemble ttm\ntimestep 0.1\nntypes 1\nttmdimx 8\n"
          "fd_min_atoms 4\ntmm_threshold 1e-6\nlambda 8e-7\n")
    with pytest.raises(ValueError, match="hc_int"):
        v("ensemble nvx\ntimestep 0.1\nntypes 1\nstarttemp 0.1\n"
          "hc_nlayers 4\n")
    # default fills
    c = v("ensemble nve\ntimestep 0.1\nntypes 1\nstarttemp 0.05\n"
          "maxsteps 100\navpos_int 10\n")
    assert c.endtemp == 0.05 and c.avpos_end == 100
    c = v("ensemble nve\ntimestep 0.1\nntypes 1\neng_int 7\n"
          "correl_int 5\ncorrel_rmax 3\ncorrel_tmax 10\n")
    assert c.correl_ts == 7
