"""External bridge gating: KIM raises cleanly, FCS dispatches to Ewald."""

import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models.external import fcs_forces, have_kim, kim_forces
from imd_tpu.ops.geometry import Box


def test_kim_gated_with_clear_error():
    if have_kim():
        pytest.skip("kimpy unexpectedly present")
    with pytest.raises(ImportError, match="kimpy"):
        kim_forces(jnp.zeros((2, 3)), jnp.zeros(2, jnp.int32),
                   Box.cubic(10.0), "ex_model")


def test_fcs_rejects_unavailable_methods():
    with pytest.raises(ValueError, match="ewald"):
        fcs_forces(np.zeros((2, 3)), np.ones(2), Box.cubic(10.0),
                   method="p3m")


def test_fcs_ewald_neutral_pair():
    """+q/-q pair: energy finite/negative, forces attract, Newton 3."""
    box = Box.cubic(20.0, dtype=jnp.float64)
    pos = np.asarray([[8.0, 10.0, 10.0], [12.0, 10.0, 10.0]])
    e, f, scene = fcs_forces(pos, np.asarray([1.0, -1.0]), box,
                             kappa=0.25, kcut=1.5)
    assert np.isfinite(float(e))
    ids = np.asarray(scene.id).reshape(-1)
    ff = np.asarray(f).reshape(-1, 3)[ids >= 0][np.argsort(ids[ids >= 0])]
    np.testing.assert_allclose(ff[0] + ff[1], 0.0, atol=1e-10)
    assert ff[0][0] > 0 and ff[1][0] < 0   # attraction
