"""HF / KS SCF engines: pure functions of (density matrix, theta).

TPU-native redesign of the reference's engine classes
(/root/reference/dqc/qccalc/hf.py, ks.py, scf_qccalc.py). The engine owns no
tensors: `theta` (a pytree of precomputed integrals + grid tables + occ
weights) is the only state, so jax.grad sees through everything, replacing
the EditableModule/getparamnames machinery.

State convention: restricted -> dm (nao, nao); polarized -> dm (2, nao, nao).
Unlike the reference (hybrid functionals NOT wired into KS, ks.py:176-187),
the KS engine here supports hybrid exact exchange (B3LYP etc.) natively.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .eigh import safe_eigh
from .orth import LARGE


def orthogonal_fock_to_dm(fock, X, keep, occ):
    """fock: (..., nao, nao); X: (nao, nao) masked orthogonalizer;
    occ: (..., nao) occupation weights aligned to ascending eigenvalues.
    Returns (dm, orbital energies, C)."""
    fp = jnp.einsum("im,...ij,jn->...mn", X, fock, X)
    # pin masked-out directions high so they are never occupied. The pin
    # must stay well inside the dtype's eigh dynamic range: 1e7 in f32
    # costs ~1 Ha of accuracy on the physical spectrum (1e7 * eps_f32).
    large = LARGE if fock.dtype == jnp.float64 else 3.0e4
    pin = jnp.where(keep, 0.0, large)
    fp = fp + jnp.diag(pin)
    w, u = safe_eigh(fp)
    c = jnp.einsum("ij,...jk->...ik", X, u)
    dm = jnp.einsum("...ik,...k,...jk->...ij", c, occ, c)
    return dm, w, c


class HFEngine:
    """Restricted/unrestricted Hartree-Fock.

    theta keys: hcore (nao,nao), eri (nao,)*4, X, keep, occ, enuc.
    Parity: reference _HFEngine (hf.py:115-247)."""

    def __init__(self, polarized: bool = False, jk_info=None):
        self.polarized = polarized
        # (BasisMeta, jk_meta) for the streaming direct-SCF J/K path
        self.jk_info = jk_info

    # --- coulomb/exchange (dense ERI, streamed, or density-fitted) ---
    def _j(self, theta, dm_tot):
        if "pbcft" in theta:
            from ..ops.pbcft import aft_j
            return aft_j(theta["pbcft"], dm_tot)
        if "eri_j" in theta:
            # Coulomb-layout dense ERI (qccalc._maybe_expand_j): flat
            # trailing-axis MXU matvec, same shape trick as eri_k
            return jnp.einsum("ijkl,kl->ij", theta["eri_j"], dm_tot)
        if "eri" in theta:
            return jnp.einsum("ijkl,kl->ij", theta["eri"], dm_tot)
        if "jkb0" in theta:
            from .jk import jk_from_blocks, theta_blocks
            bmeta, jkm = self.jk_info
            j, _ = jk_from_blocks(bmeta, jkm, theta_blocks(theta, jkm),
                                  dm_tot, want_j=True, want_k=False)
            return j
        if "jk_facs" in theta:
            from .jk import jk_matrices
            bmeta, jkm = self.jk_info
            j, _ = jk_matrices(bmeta, jkm, theta["jk_facs"], dm_tot,
                               want_j=True, want_k=False)
            return j
        from .df import df_j
        return df_j(theta["df"], dm_tot)

    def _k(self, theta, dm):
        if "pbcft" in theta:
            # G-space exchange from the pair-FT tensors (+Madelung G=0
            # correction) — beyond the reference, whose PBC exact exchange
            # is NotImplemented (hcgto_pbc.py:183-185)
            from ..ops.pbcft import aft_k
            return aft_k(theta, dm)
        if "eri" in theta:
            return jnp.einsum("ikjl,...kl->...ij", theta["eri"], dm)
        if "eri_k" in theta:
            # exchange-layout dense ERI: trailing-axis matvec, no transpose
            fast = lambda d: jnp.einsum("ijkl,...kl->...ij",
                                        theta["eri_k"], d)
            if "eri_k_ok" in theta and "jkb0" in theta:
                # runtime-arbitrated (scf/qccalc.solve_dm): the axon TPU
                # can miscompile the big expand_k program; on a failed
                # in-graph checksum fall back to the blocks path
                from .jk import jk_from_blocks, theta_blocks
                bmeta, jkm = self.jk_info

                def safe(d):
                    _, k = jk_from_blocks(bmeta, jkm,
                                          theta_blocks(theta, jkm), d,
                                          want_j=False, want_k=True)
                    return k
                import jax
                return jax.lax.cond(theta["eri_k_ok"], fast, safe, dm)
            return fast(dm)
        if "jkb0" in theta:
            from .jk import jk_from_blocks, theta_blocks
            bmeta, jkm = self.jk_info
            _, k = jk_from_blocks(bmeta, jkm, theta_blocks(theta, jkm), dm,
                                  want_j=False, want_k=True)
            return k
        if "jk_facs" in theta:
            from .jk import jk_matrices
            bmeta, jkm = self.jk_info
            _, k = jk_matrices(bmeta, jkm, theta["jk_facs"], dm,
                               want_j=False, want_k=True)
            return k
        from .df import df_k
        return df_k(theta["df"], dm)

    def dm_tot(self, dm):
        return dm.sum(axis=0) if self.polarized else dm

    def _k_lr(self, theta, dm, i):
        """Exchange with the long-range erf(omega r)/r kernel (term i of
        xc.exx_lr). Served by a dense attenuated ERI ("eri_lr{i}") or an
        attenuated-metric RI fit ("df_lr{i}") — built in qccalc.KS."""
        key = f"eri_lr{i}"
        if key in theta:
            return jnp.einsum("ikjl,...kl->...ij", theta[key], dm)
        if "pbcft" in theta:
            # PBC range separation in G-space: LR = full - SR, where the
            # SR (erfc) kernel weights wsr{i} are finite at G=0 (no
            # divergence treatment) and the full kernel keeps its
            # Madelung exxdiv correction (ops/pbcft.coulomb_gweights_sr).
            # HSE-class screened hybrids come out as
            # hyb*K_full + c_lr*K_lr with c_lr = -hyb_sr.
            from ..ops.pbcft import aft_k, aft_k_weighted
            return aft_k(theta, dm) - aft_k_weighted(
                theta["pbcft"], dm, theta["pbcft"][f"wsr{i}"])
        from .df import df_k
        if f"df_sr{i}" in theta:
            # PBC GDF: LR = full-kernel fit (Madelung-corrected) minus
            # the short-range-metric fit (scf/pbc.build_pbc_core_theta)
            return df_k(theta["df"], dm) - df_k(theta[f"df_sr{i}"], dm)
        return df_k(theta[f"df_lr{i}"], dm)

    # fock = fock_from_parts(dm, *jk_parts(dm)) — split so the host-driven
    # DIIS can compile the quartet-stream J/K and the rest as separate,
    # much smaller XLA modules (scf/qccalc._host_solve).
    def jk_parts(self, dm, theta):
        if "eri_dsh" in theta and dm.dtype == jnp.float64:
            # fused double-single pallas kernel: one pass over the hi/lo
            # f32 planes of the J-layout ERI computes BOTH matrices
            # (~20x the two XLA emulated-f64 GEMVs; ops/pallas_jk.py)
            from ..ops.pallas_jk import ds_jk_kplanes
            if self.polarized:
                ju, ku = ds_jk_kplanes(theta["eri_dsh"],
                                       theta["eri_dsl"], dm[0])
                jd, kd = ds_jk_kplanes(theta["eri_dsh"],
                                       theta["eri_dsl"], dm[1])
                return ju + jd, jnp.stack([ku, kd])
            return ds_jk_kplanes(theta["eri_dsh"], theta["eri_dsl"], dm)
        if "jkb0" in theta and "eri_j" not in theta:
            from .jk import jk_from_blocks, theta_blocks
            bmeta, jkm = self.jk_info
            # K from the exchange-layout tensor when present (pure matvec);
            # else one pass over the blocks (J and K share each block read)
            want_k_blocks = "eri_k" not in theta
            j, k = jk_from_blocks(bmeta, jkm, theta_blocks(theta, jkm), dm,
                                  want_j=True, want_k=want_k_blocks)
            if not want_k_blocks:
                k = self._k(theta, dm)
            return j, k
        j = self._j(theta, self.dm_tot(dm))
        k = self._k(theta, dm)
        return j, k

    def fock_from_parts(self, dm, j, k, theta):
        if self.polarized:
            return theta["hcore"][None] + j[None] - k
        return theta["hcore"] + j - 0.5 * k

    def fock(self, dm, theta):
        return self.fock_from_parts(dm, *self.jk_parts(dm, theta), theta)

    def dm_from_fock(self, fock, theta):
        dm, _, _ = orthogonal_fock_to_dm(fock, theta["X"], theta["keep"],
                                         theta["occ"])
        return dm

    def step(self, dm, theta):
        return self.dm_from_fock(self.fock(dm, theta), theta)

    def energy_from_parts(self, dm, j, k, theta, exc=None):
        """Total energy from precomputed J/K (host-driven path: J/K come
        from the per-combo jitted quartet stream, so the energy module
        stays small). `exc` is ignored for HF (KS uses it to skip the
        grid pass when the converged iterate already computed it)."""
        dmt = self.dm_tot(dm)
        e1 = jnp.einsum("ij,ij->", theta["hcore"], dmt)
        ej = 0.5 * jnp.einsum("ij,ij->", j, dmt)
        if self.polarized:
            ek = -0.5 * jnp.einsum("sij,sij->", k, dm)
        else:
            ek = -0.25 * jnp.einsum("ij,ij->", k, dm)
        return e1 + ej + ek + theta["enuc"]

    def energy(self, dm, theta):
        return self.energy_from_parts(dm, self._j(theta, self.dm_tot(dm)),
                                      self._k(theta, dm), theta)

    # --- DIIS plumbing (solver iterates on the Fock matrix) ---
    def diis_err(self, fock, dm, theta):
        s, X = theta["ovlp"], theta["X"]
        fds = jnp.einsum("...ij,...jk,kl->...il", fock, dm, s)
        comm = fds - jnp.swapaxes(fds, -1, -2)
        return jnp.einsum("im,...ij,jn->...mn", X, comm, X)


class KSEngine(HFEngine):
    """Restricted/unrestricted Kohn-Sham with LDA/GGA/MGGA + hybrid mixing.

    Extra theta keys: grid tables under theta['grid'] (ao values etc., built
    by dqc_tpu.scf.hamilton.setup_grid_theta) and the XC object is held
    statically on the engine. Parity: reference _KSEngine (ks.py:103-227),
    plus hybrid exact exchange which the reference lacks.
    """

    def __init__(self, xc, polarized: bool = False, jk_info=None):
        super().__init__(polarized, jk_info=jk_info)
        self.xc = xc

    def jk_parts(self, dm, theta):
        want_k = self.xc.exx_fraction != 0.0
        if "eri_dsh" in theta and dm.dtype == jnp.float64:
            # fused double-single pallas kernel (ops/pallas_jk.py): J and
            # K from ONE pass over the hi/lo planes of eri_k (~20x the
            # XLA f64 GEMVs; K is free, so compute it even for pure
            # functionals' J-only builds)
            from ..ops.pallas_jk import ds_jk_kplanes
            if self.polarized:
                ju, ku = ds_jk_kplanes(theta["eri_dsh"],
                                       theta["eri_dsl"], dm[0])
                jd, kd = ds_jk_kplanes(theta["eri_dsh"],
                                       theta["eri_dsl"], dm[1])
                return ju + jd, (jnp.stack([ku, kd]) if want_k else None)
            j, k = ds_jk_kplanes(theta["eri_dsh"], theta["eri_dsl"], dm)
            return j, (k if want_k else None)
        if "jkb0" in theta:
            from .jk import jk_from_blocks, theta_blocks
            bmeta, jkm = self.jk_info
            want_k_blocks = want_k and "eri_k" not in theta
            j, k = jk_from_blocks(bmeta, jkm, theta_blocks(theta, jkm), dm,
                                  want_j=True, want_k=want_k_blocks)
            if want_k and not want_k_blocks:
                k = self._k(theta, dm)
            return j, k
        j = self._j(theta, self.dm_tot(dm))
        k = (self._k(theta, dm) if want_k else None)
        return j, k

    def fock_from_parts(self, dm, j, k, theta):
        from ..xc.integrate import vxc_matrix
        vxc = vxc_matrix(self.xc, dm, theta["grid"], self.polarized,
                         xcparams=theta.get("xc_params"))
        f = theta["hcore"] + j
        hyb = self.xc.exx_fraction
        if self.polarized:
            f = f[None] + vxc
            if k is not None:
                f = f - hyb * k
            for i, (c, _) in enumerate(self.xc.exx_lr):
                f = f - c * self._k_lr(theta, dm, i)
        else:
            f = f + vxc
            if k is not None:
                f = f - 0.5 * hyb * k
            for i, (c, _) in enumerate(self.xc.exx_lr):
                f = f - 0.5 * c * self._k_lr(theta, dm, i)
        return f

    def fock(self, dm, theta):
        return self.fock_from_parts(dm, *self.jk_parts(dm, theta), theta)

    def energy_from_parts(self, dm, j, k, theta, exc=None):
        """Total energy from precomputed J/K (see HFEngine.energy_from_parts);
        k is None for pure (exx-free) functionals. `exc`: precomputed XC
        energy (the host loop's verify iteration computes it alongside
        vxc — skips a full grid pass here)."""
        from ..xc.integrate import exc_energy
        dmt = self.dm_tot(dm)
        e1 = jnp.einsum("ij,ij->", theta["hcore"], dmt)
        ej = 0.5 * jnp.einsum("ij,ij->", j, dmt)
        if exc is None:
            exc = exc_energy(self.xc, dm, theta["grid"], self.polarized,
                             xcparams=theta.get("xc_params"))
        e = e1 + ej + exc + theta["enuc"]
        hyb = self.xc.exx_fraction
        if hyb != 0.0:
            if self.polarized:
                e = e - 0.5 * hyb * jnp.einsum("sij,sij->", k, dm)
            else:
                e = e - 0.25 * hyb * jnp.einsum("ij,ij->", k, dm)
        for i, (c, _) in enumerate(self.xc.exx_lr):
            klr = self._k_lr(theta, dm, i)
            if self.polarized:
                e = e - 0.5 * c * jnp.einsum("sij,sij->", klr, dm)
            else:
                e = e - 0.25 * c * jnp.einsum("ij,ij->", klr, dm)
        return e

    def energy(self, dm, theta):
        k = self._k(theta, dm) if self.xc.exx_fraction != 0.0 else None
        return self.energy_from_parts(dm, self._j(theta, self.dm_tot(dm)),
                                      k, theta)
