"""Frenkel-Ladd free-energy integration (imd_fefl.c).

calc_fefl (imd_fefl.c:33-82) mixes the real interatomic forces with an
Einstein-crystal tether:  F <- (1 - lambda) F + lambda (-k_t d), where
d = x - x_ref and k_t = spring_rate[type]; the accumulated Einstein
energy sum k_t d^2 (the reference's tot_harm_energy, no 1/2 - parity
with imd_fefl.c:62) is the lambda-derivative observable for
thermodynamic integration  Delta F = int_0^1 <dU/dlambda> dlambda.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from imd_tpu.scene import Scene


def calc_fefl(scene: Scene, ref_pos_by_id: jnp.ndarray,
              spring_rate: Sequence[float], lam
              ) -> Tuple[Scene, jnp.ndarray]:
    """Mix forces with the Einstein tether; returns (scene, harm_energy).

    ``ref_pos_by_id``: [max_id+1, 3] reference crystal positions indexed
    by atom id (REF_POS analog); ``lam`` in [0, 1]: 0 = fully real
    system, 1 = fully Einstein crystal.
    """
    k = jnp.asarray(spring_rate, scene.pos.dtype)[
        jnp.clip(scene.type, 0, len(spring_rate) - 1)]
    d = scene.pos - ref_pos_by_id[scene.id]
    m = scene.fmask()
    harm = jnp.sum(k * jnp.sum(d * d, -1) * m)
    F = (1.0 - lam) * scene.force - (lam * k * m)[..., None] * d
    return scene.replace(force=F), harm
