"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

This is the multi-chip-without-a-cluster trick the reference lacks
(SURVEY.md §4): sharding logic is exercised on a virtual CPU mesh.

NOTE: the env var JAX_PLATFORMS is ignored when the axon TPU plugin is
installed; `jax.config.update("jax_platforms", "cpu")` is what actually
forces the CPU backend here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# smoke tier: `pytest -m smoke` runs one fast test per subsystem (<2 min on
# one CPU core), the CI-able safety net the full 150-test suite is too slow
# for in constrained boxes (VERDICT r1 #10).
# ---------------------------------------------------------------------------

_SMOKE = {
    "test_forces.py::test_stencil_matches_n2_oracle",       # force kernels
    "test_potential.py::test_lj_table_matches_analytic",    # potentials
    "test_potential.py::test_format1_parse",                # table formats
    "test_eam.py::test_eam_stencil_matches_oracle",         # EAM
    "test_ttm.py::test_eos_roundtrip",                      # TTM/EOS
    "test_tmm.py::test_fresnel_and_unitarity",              # TMM
    "test_sharding.py::test_sharded_forces_match_single_device",  # P1-P3
    "test_loadbalance.py::test_repartition_equalizes_slab_loads",  # P4 LB
    "test_nrb_filter.py::test_init_nrb_finds_boundary_layer",  # NRB
    "test_simulation.py::test_param_file_run",              # driver/config
    "test_misc.py::test_graceful_stop_file",                # stop machinery
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast cross-subsystem tier (pytest -m smoke)")
    config.addinivalue_line(
        "markers", "slow: long-running test (deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        short = item.nodeid.split("/")[-1]
        base = short.split("[")[0]
        if base in _SMOKE:
            item.add_marker(pytest.mark.smoke)
