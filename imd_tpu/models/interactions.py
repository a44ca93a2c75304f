"""Runtime dispatch of the analytic interaction families from tags.

The reference selects SW/TERSOFF/TERSOFFMOD/KEATING/TTBP/MEAM at
compile time (Makefile target grammar + config.h implication rules);
the runtime equivalent keys on which tag group the parameter file
provides (imd_param.c: stiweb_* 2003-2070, ters_* 2189-2289, keating_*
1952-2001, ttbp_* 1901-1950, meam_* 1663-1899) plus an optional
``interaction`` override tag for the ters_* ambiguity (tersoff vs
tersoffmod share the tag group; the reference distinguishes by flag).

These families run the autodiff all-pairs engines (models/covalent.py,
models/meam.py) over the flat slot arrays — correct physics for the
small covalent systems these potentials target (the reference's own
covalent path is a per-atom neighbor-table double loop,
imd_forces_covalent.c); the cell/Pallas hot path stays EAM/pair.  The
driver adapter distributes the models' TOTAL energies as per-atom
averages into the .chkpt Epot column (documented deviation) and gets
the exact virial from the uniform-strain derivative -dE/dlambda.

TTBP is additive: its three-body term rides on top of the tabulated
pair potential the normal cell engine computes (the reference's TTBP
builds are PAIR+TTBP, config.h).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _first(t, default):
    return float(t[0]) if t else float(default)


def _pair_upper(vals, nt, default):
    """[nt, nt] symmetric matrix from the reference's ntypepairs-ordered
    flat tag (upper triangle row-major, init_tersoff
    imd_forces_covalent.c:1459-1476); short tags repeat the last value."""
    m = np.full((nt, nt), float(default))
    k = 0
    for i in range(nt):
        for j in range(i, nt):
            if vals:
                m[i, j] = m[j, i] = float(vals[min(k, len(vals) - 1)])
            k += 1
    return m


def _offdiag(vals, nt, diag):
    """[nt, nt] matrix with fixed diagonal and the reference's
    off-diagonal-only tag layout (index i(2nt-i-3)/2 + j - 1, used for
    ters_chi/ters_om, imd_forces_covalent.c:1480-1495)."""
    m = np.full((nt, nt), float(diag))
    for i in range(nt - 1):
        for j in range(i + 1, nt):
            k = i * (2 * nt - i - 3) // 2 + j - 1
            if vals:
                m[i, j] = m[j, i] = float(vals[min(k, len(vals) - 1)])
    return m


def _angular(vals, nt, default, pair_layout):
    """Angular-parameter matrix: TERSOFF(2)'s g() params come as ntypes
    per-CENTER-type values (base build; rows broadcast) or ntypepairs
    per-bond values (the '2' build), imd_param.c:5094-5108."""
    npairs = nt * (nt + 1) // 2
    if pair_layout or (nt > 1 and vals and len(vals) == npairs):
        return _pair_upper(vals, nt, default)
    m = np.full((nt, nt), float(default))
    for i in range(nt):
        if vals:
            m[i, :] = float(vals[min(i, len(vals) - 1)])
    return m


def select_flat_interaction(cfg, dtype, pair_table=None):
    """Returns (name, cutoff, energy_fn, additive) or None.

    ``energy_fn(pos [N,3], types [N], mask [N], box) -> scalar E`` —
    differentiable; ``additive`` marks a term that ADDS to the normal
    tabulated-pair engine (TTBP) instead of replacing it.
    ``pair_table`` (a PotTable) supplies MEAM's screened pair phi
    (PAIR_INT inside the screening loop, imd_forces_meam.c:416).
    """
    from imd_tpu.models import covalent as cov

    inter = getattr(cfg, "interaction", "").lower()

    if (any((cfg.stiweb_a, cfg.stiweb_b, cfg.stiweb_p, cfg.stiweb_q,
             cfg.stiweb_a1, cfg.stiweb_de, cfg.stiweb_ga, cfg.stiweb_la))
            or inter == "stiweb"):
        d = cov.SWParams()
        P = cov.SWParams(
            epsilon=_first(cfg.stiweb_de, d.epsilon),
            sigma=d.sigma,
            a=_first(cfg.stiweb_a1, d.a),
            A=_first(cfg.stiweb_a, d.A),
            B=_first(cfg.stiweb_b, d.B),
            p=_first(cfg.stiweb_p, d.p),
            q=_first(cfg.stiweb_q, d.q),
            lam=_first(cfg.stiweb_la, d.lam),
            gamma=_first(cfg.stiweb_ga, d.gamma),
            a2=_first(cfg.stiweb_a2, 0.0))
        cut = max(P.a, P.a2) * P.sigma
        tern = bool(getattr(cfg, "ternbcc", 0))

        def efn(pos, types, mask, box):
            return cov.sw_energy(pos, box, mask, P, ternbcc=tern)

        # large-N form: same energy over the fixed-K neighbor lists
        # (the do_neightab/do_forces2 analog, ops/neighbors.py)
        efn.nbr = lambda pos, types, mask, box, nbr: \
            cov.sw_energy_nbr(pos, nbr, box, P, ternbcc=tern)
        return ("stiweb" if not tern else "stiweb-ternbcc",
                float(cut), efn, False)

    if (any((cfg.keating_alpha, cfg.keating_beta, cfg.keating_d))
            or inter == "keating"):
        d = cov.KeatingParams()
        kd = _first(cfg.keating_d, d.d)
        P = cov.KeatingParams(
            alpha=_first(cfg.keating_alpha, d.alpha),
            beta=_first(cfg.keating_beta, d.beta),
            d=kd,
            r_cut=kd * (d.r_cut / d.d))

        def efn(pos, types, mask, box):
            return cov.keating_energy(pos, box, mask, P)
        return ("keating", float(P.r_cut), efn, False)

    if (any((cfg.ttbp_constant, cfg.ttbp_sp, cfg.ttbp_cut))
            or inter == "ttbp"):
        d = cov.TTBPParams()
        P = cov.TTBPParams(
            constant=_first(cfg.ttbp_constant, d.constant),
            sp=_first(cfg.ttbp_sp, d.sp),
            r_cut=_first(cfg.ttbp_cut, d.r_cut))

        xt = bool(getattr(cfg, "xt", 0))

        def efn(pos, types, mask, box):
            return cov.ttbp_energy(pos, box, mask, P, xt=xt)
        return ("ttbp" if not xt else "ttbp-xt",
                float(P.r_cut), efn, True)

    if (any((cfg.ters_a, cfg.ters_b, cfg.ters_la, cfg.ters_mu,
             cfg.ters_r_cut, cfg.ters_r0, cfg.ters_n, cfg.ters_c))
            or inter in ("tersoff", "tersoffmod",
                         "tersoff2", "tersoffmod2")):
        mod = (inter in ("tersoffmod", "tersoffmod2") or bool(cfg.ters_c1)
               or bool(cfg.ters_eta) or bool(cfg.ters_delta))
        nt = max(cfg.ntypes, 1)
        pair2 = inter in ("tersoff2", "tersoffmod2")
        if nt > 1 or pair2:
            # multi-species path: pair-matrix parameters (TERSOFF/
            # TERSOFFMOD with per-type angular terms, or the '2'
            # variants with per-pair angular fits)
            if mod:
                d = cov.TersoffModParams()
                P = cov.TersoffModMultiParams(
                    r0=_pair_upper(cfg.ters_r0, nt, d.r0),
                    r_cut=_pair_upper(cfg.ters_r_cut, nt, d.r_cut),
                    A=_pair_upper(cfg.ters_a, nt, d.A),
                    B=_pair_upper(cfg.ters_b, nt, d.B),
                    la=_pair_upper(cfg.ters_la, nt, d.la),
                    mu=_pair_upper(cfg.ters_mu, nt, d.mu),
                    eta=_angular(cfg.ters_eta, nt, d.eta, pair2),
                    delta=_angular(cfg.ters_delta, nt, d.delta, pair2),
                    alpha=_angular(cfg.ters_alpha, nt, d.alpha, pair2),
                    beta=np.rint(_angular(cfg.ters_beta, nt, d.beta,
                                          pair2)).astype(np.int32),
                    c1=_angular(cfg.ters_c1, nt, d.c1, pair2),
                    c2=_angular(cfg.ters_c2, nt, d.c2, pair2),
                    c3=_angular(cfg.ters_c3, nt, d.c3, pair2),
                    c4=_angular(cfg.ters_c4, nt, d.c4, pair2),
                    c5=_angular(cfg.ters_c5, nt, d.c5, pair2),
                    h=_angular(cfg.ters_h, nt, d.h, pair2))

                def efn(pos, types, mask, box):
                    return cov.tersoffmod_multi_energy(pos, types, box,
                                                       mask, P)
                return ("tersoffmod2" if pair2 else "tersoffmod",
                        float(P.r_cut.max()), efn, False)
            d = cov.TersoffParams()
            cmat = _angular(cfg.ters_c, nt, d.c, pair2)
            dmat = _angular(cfg.ters_d, nt, d.d, pair2)
            # absorb the off-diagonal chi mixing into B
            # (imd_forces_covalent.c:1480-1487)
            bmat = _pair_upper(cfg.ters_b, nt, d.B) \
                * _offdiag(cfg.ters_chi, nt, 1.0)
            P = cov.TersoffMultiParams(
                r0=_pair_upper(cfg.ters_r0, nt, d.R - d.D),
                r_cut=_pair_upper(cfg.ters_r_cut, nt, d.R + d.D),
                A=_pair_upper(cfg.ters_a, nt, d.A),
                B=bmat,
                la=_pair_upper(cfg.ters_la, nt, d.lam1),
                mu=_pair_upper(cfg.ters_mu, nt, d.lam2),
                om=_offdiag(cfg.ters_om, nt, 1.0),
                ga=_angular(cfg.ters_ga, nt, d.beta, pair2),
                n=_angular(cfg.ters_n, nt, d.n, pair2),
                c2=cmat * cmat, d2=dmat * dmat,
                h=_angular(cfg.ters_h, nt, d.h, pair2))

            def efn(pos, types, mask, box):
                return cov.tersoff_multi_energy(pos, types, box, mask, P)
            return ("tersoff2" if pair2 else "tersoff",
                    float(P.r_cut.max()), efn, False)
        if mod:
            d = cov.TersoffModParams()
            P = cov.TersoffModParams(
                A=_first(cfg.ters_a, d.A), B=_first(cfg.ters_b, d.B),
                la=_first(cfg.ters_la, d.la),
                mu=_first(cfg.ters_mu, d.mu),
                eta=_first(cfg.ters_eta, d.eta),
                delta=_first(cfg.ters_delta, d.delta),
                alpha=_first(cfg.ters_alpha, d.alpha),
                beta=int(_first(cfg.ters_beta, d.beta)),
                c1=_first(cfg.ters_c1, d.c1), c2=_first(cfg.ters_c2, d.c2),
                c3=_first(cfg.ters_c3, d.c3), c4=_first(cfg.ters_c4, d.c4),
                c5=_first(cfg.ters_c5, d.c5), h=_first(cfg.ters_h, d.h),
                r0=_first(cfg.ters_r0, d.r0),
                r_cut=_first(cfg.ters_r_cut, d.r_cut))

            def efn(pos, types, mask, box):
                return cov.tersoffmod_energy(pos, box, mask, P)

            efn.nbr = lambda pos, types, mask, box, nbr: \
                cov.tersoffmod_energy_nbr(pos, nbr, box, P)
            return ("tersoffmod", float(P.r_cut), efn, False)
        d = cov.TersoffParams()
        # IMD fc window runs ter_r0..ter_r_cut -> R = mid, D = half-width
        r_lo = _first(cfg.ters_r0, d.R - d.D)
        r_hi = _first(cfg.ters_r_cut, d.R + d.D)
        P = cov.TersoffParams(
            A=_first(cfg.ters_a, d.A), B=_first(cfg.ters_b, d.B),
            lam1=_first(cfg.ters_la, d.lam1),
            lam2=_first(cfg.ters_mu, d.lam2),
            beta=_first(cfg.ters_ga, d.beta),
            n=_first(cfg.ters_n, d.n), c=_first(cfg.ters_c, d.c),
            h=_first(cfg.ters_h, d.h),
            d=_first(cfg.ters_d, d.d),
            R=0.5 * (r_lo + r_hi), D=0.5 * (r_hi - r_lo))

        def efn(pos, types, mask, box):
            return cov.tersoff_energy(pos, box, mask, P)

        efn.nbr = lambda pos, types, mask, box, nbr: \
            cov.tersoff_energy_nbr(pos, nbr, box, P)
        return ("tersoff", float(r_hi), efn, False)

    if (any((cfg.meam_t1, cfg.meam_r0, cfg.meam_beta0, cfg.meam_e,
             cfg.meam_rcut)) or inter == "meam"):
        from imd_tpu.models.meam import MEAMParams, meam_al_params, \
            meam_energy
        nt = max(cfg.ntypes, 1)
        dflt = meam_al_params(dtype)

        def per_type(t, dv):
            if not t:
                return jnp.full((nt,), float(dv[0]), dtype)
            vals = list(t) + [t[-1]] * (nt - len(t))
            return jnp.asarray(vals[:nt], dtype)

        def mat(t, dv, shape):
            v = float(t[0]) if t else float(np.asarray(dv).flat[0])
            return jnp.full(shape, v, dtype)

        P = MEAMParams(
            t1=per_type(cfg.meam_t1, dflt.t1),
            t2=per_type(cfg.meam_t2, dflt.t2),
            t3=per_type(cfg.meam_t3, dflt.t3),
            f0=per_type(cfg.meam_f0, dflt.f0),
            r0=per_type(cfg.meam_r0, dflt.r0),
            beta0=per_type(cfg.meam_beta0, dflt.beta0),
            beta1=per_type(cfg.meam_beta1, dflt.beta1),
            beta2=per_type(cfg.meam_beta2, dflt.beta2),
            beta3=per_type(cfg.meam_beta3, dflt.beta3),
            cmin=mat(cfg.meam_cmin, dflt.cmin, (nt, nt, nt)),
            cmax=mat(cfg.meam_cmax, dflt.cmax, (nt, nt, nt)),
            rcut=mat(cfg.meam_rcut, dflt.rcut, (nt, nt)),
            deltar=mat(cfg.meam_deltar, dflt.deltar, (nt, nt)),
            e=per_type(cfg.meam_e, dflt.e),
            a=per_type(cfg.meam_a, dflt.a),
            rho0=per_type(cfg.meam_rho0, dflt.rho0),
            t_average=bool(cfg.meam_t_average))
        cut = float(jnp.max(P.rcut))

        pair_fn = None
        if pair_table is not None:
            pt = pair_table
            ntp = max(cfg.ntypes, 1)
            rc2 = pt.max_end

            def pair_fn(r, ti, tj):      # noqa: F811
                col = jnp.clip(ti * ntp + tj, 0, ntp * ntp - 1)
                r2 = jnp.maximum(r * r, 1e-12)
                v, _ = pt.interp(col, r2)
                return jnp.where(r2 < rc2, v, 0.0)
            cut = max(cut, float(np.sqrt(np.asarray(rc2).max())))

        def efn(pos, types, mask, box):
            return meam_energy(pos, types, box, mask, P,
                               pair_fn=pair_fn)
        return ("meam", cut, efn, False)

    if (cfg.dp_alpha and cfg.ms_D) or inter == "dipole":
        # Tangney-Scandolo polarizable force field (dp_*/ms_* tags,
        # imd_param.c:3451-3539): SCF dipoles inside the energy, forces
        # and virial by Hellmann-Feynman (dE/dp = 0 at convergence, so
        # the fixed-p gradients are exact)
        import jax

        from imd_tpu.models.dipole import (DipoleParams, dipole_energy,
                                           scf_dipoles,
                                           sio2_demo_params)
        nt = max(cfg.ntypes, 1)
        dflt = sio2_demo_params(dtype)

        def per_type(t, dv):
            if not t:
                return jnp.asarray(np.resize(np.asarray(dv), nt), dtype)
            vals = list(t) + [t[-1]] * (nt - len(t))
            return jnp.asarray(vals[:nt], dtype)

        def tri_mat(t, dv):
            if not t:
                return jnp.asarray(
                    np.resize(np.asarray(dv), (nt, nt)), dtype)
            m = np.zeros((nt, nt))
            k = 0
            for a in range(nt):
                for b in range(a, nt):
                    v = float(t[min(k, len(t) - 1)])
                    m[a, b] = m[b, a] = v
                    k += 1
            return jnp.asarray(m, dtype)

        rc = float(cfg.r_cut[0]) if cfg.r_cut else float(dflt.r_cut)
        yd = float(getattr(cfg, "yuk_smoothlength", 0.0))
        yb = float(getattr(cfg, "yuk_beta", 0.0))
        if yb > 0.0:
            # KERMODE: the Yukawa smooth cutoff extends the coulomb
            # reach to ke_tot_rcut = ke_rcut + yuk_smoothlength
            # (imd.c:96); DipoleParams.r_cut is the total reach
            rc = rc + yd
        P = DipoleParams(
            charges=per_type(cfg.charge, dflt.charges),
            alpha=per_type(cfg.dp_alpha, dflt.alpha),
            b=tri_mat(cfg.dp_b, dflt.b), c=tri_mat(cfg.dp_c, dflt.c),
            ms_D=tri_mat(cfg.ms_D, dflt.ms_D),
            ms_gamma=tri_mat(cfg.ms_gamma, dflt.ms_gamma),
            ms_r0=tri_mat(cfg.ms_r0, dflt.ms_r0),
            r_cut=rc, dp_mix=cfg.dp_mix, dp_tol=cfg.dp_tol,
            yuk_beta=yb, yuk_smoothlength=yd)

        def efn(pos, types, mask, box):
            p, _ = scf_dipoles(pos, types, box, mask, P)
            p = jax.lax.stop_gradient(p)
            return dipole_energy(pos, types, box, mask, P, p=p)
        return ("dipole", rc, efn, False)

    return None


def make_adp_interaction(cfg, eam, u_tab, w_tab):
    """ADP (Mishin EAM + dipole/quadrupole distortions) as a flat
    interaction: phi/rho/F come from the loaded EAM tables, u/w from
    the adp_upotfile/adp_wpotfile tables (imd_forces_nbl.c:891-930;
    setup_potentials).  Returns the (name, cutoff, efn, additive)
    tuple of select_flat_interaction.  Single-species column 0 (the
    reference's ADP sites are type-pair indexed the same way; alloys
    can extend the closure with one-hot selects)."""
    import math

    from imd_tpu.models.adp import ADPFuncs, adp_energy

    r_cut = math.sqrt(float(np.asarray(eam.pair.end).max()))

    def of(tab, col=0):
        def f(r):
            v, _ = tab.interp(col, jnp.maximum(r * r, 1e-12))
            return jnp.where(r * r < tab.max_end, v, 0.0)
        return f

    def embed(rho_t):
        v, _ = eam.embed.interp(0, jnp.maximum(rho_t, 1e-12))
        return v

    funcs = ADPFuncs(phi=of(eam.pair), rho=of(eam.rho), embed=embed,
                     u=of(u_tab), w=of(w_tab), r_cut=r_cut)

    def efn(pos, types, mask, box):
        return adp_energy(pos, box, mask, funcs)
    return ("adp", r_cut, efn, False)


def flat_force_result(scene, energy_fn, ntypes: int, nbr=None):
    """Evaluate a flat-interaction energy over the padded slot arrays
    and package a ForceResult: autodiff forces, exact strain-derivative
    virial, per-atom-average epot (the models return totals).

    ``nbr`` (a NeighborList + an energy_fn carrying the ``.nbr``
    attribute) switches to the O(N*K^2) neighbor-list form — the
    large-N covalent path (do_forces2 over neightab,
    imd_forces_covalent.c); the neighbor wraps scale with the box, so
    the strain-derivative virial stays exact."""
    import jax

    from imd_tpu.ops.forces import ForceResult
    from imd_tpu.ops.geometry import Box

    shape = scene.pos.shape                      # [gx,gy,gz,cap,3]
    pos = scene.pos.reshape(-1, 3)
    mask = scene.mask.reshape(-1)
    types = jnp.clip(scene.type, 0, max(ntypes - 1, 0)).reshape(-1)
    box = scene.grid.box
    dtype = scene.pos.dtype
    e_fn = energy_fn
    if nbr is not None:
        e_fn = lambda p, t, m, b: energy_fn.nbr(p, t, m, b, nbr)  # noqa

    def etot(p, s):
        # uniform strain: scale positions AND box vectors by 1+s (the
        # pytree-level Box scaling keeps this differentiable; inv_h
        # scales inversely, so fractional coordinates are invariant)
        lam = 1.0 + s
        box_s = box.replace(h=box.h * lam, inv_h=box.inv_h / lam)
        return e_fn(p * lam, types, mask, box_s)

    s0 = jnp.zeros((), dtype)
    e, (fgrad, vgrad) = jax.value_and_grad(etot, argnums=(0, 1))(pos, s0)
    force = (-fgrad * mask[:, None].astype(dtype)).reshape(shape)
    n_alive = jnp.maximum(jnp.sum(mask.astype(dtype)), 1.0)
    epot = (e / n_alive) * scene.mask.astype(dtype)
    virial = -vgrad
    z6 = jnp.zeros((6,), dtype)
    return ForceResult(force=force, epot=epot, virial=virial,
                       presstens=z6,
                       num_neighs=jnp.zeros(shape[:-1], jnp.int32)), e
