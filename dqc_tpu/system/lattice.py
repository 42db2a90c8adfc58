"""3D Bravais lattice utilities.

Parity with the reference Lattice (/root/reference/dqc/hamilton/intor/
lattice.py): lattice/reciprocal vectors, volume, real/reciprocal-space
neighbor enumeration within cutoffs, Ewald eta estimate.

Host-side enumeration (data-dependent counts) returns numpy index sets;
the differentiable lattice vectors enter jit separately.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Lattice:
    def __init__(self, a):
        """a: (3,3) lattice vectors in rows, Bohr (may be jnp for autodiff;
        enumeration uses its concrete numpy value)."""
        self.a = jnp.asarray(a, dtype=jnp.float64)
        self._a_np = np.asarray(self.a)

    def lattice_vectors(self):
        return self.a

    def recip_vectors(self):
        """b = 2 pi a^{-T} (rows)."""
        return 2.0 * jnp.pi * jnp.linalg.inv(self.a).T

    def volume(self):
        return jnp.abs(jnp.linalg.det(self.a))

    # --- host-side enumerations -----------------------------------------
    def get_lattice_ls(self, rcut: float):
        """All lattice translations with |L| <= rcut: (nL, 3) numpy."""
        a = self._a_np
        # bound on index range per direction from the Gram matrix
        inv_len = np.linalg.norm(np.linalg.inv(a), axis=1)
        nmax = np.ceil(rcut * inv_len).astype(int) + 1
        rng = [np.arange(-n, n + 1) for n in nmax]
        ijk = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
        ls = ijk @ a
        keep = np.linalg.norm(ls, axis=1) <= rcut + 1e-12
        return ls[keep]

    def get_gvgrids(self, gcut: float):
        """Reciprocal vectors with |G| <= gcut, G != 0 optional.
        Returns (ng,3) numpy (host) and the index grid."""
        b = 2.0 * np.pi * np.linalg.inv(self._a_np).T
        inv_len = np.linalg.norm(np.linalg.inv(b), axis=1)
        nmax = np.ceil(gcut * inv_len).astype(int) + 1
        rng = [np.arange(-n, n + 1) for n in nmax]
        ijk = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
        gv = ijk @ b
        keep = np.linalg.norm(gv, axis=1) <= gcut + 1e-12
        return gv[keep], ijk[keep]

    def estimate_ewald_eta(self, precision: float = 1e-8) -> float:
        """Split parameter eta ~ sqrt(pi)/V^{1/3} heuristic (reference
        lattice.py:98-106)."""
        vol = float(np.abs(np.linalg.det(self._a_np)))
        return float(np.clip(np.sqrt(np.pi) / vol ** (1.0 / 3.0), 0.1, 10.0))


def ewald_energy(atomzs, atompos, lattice: Lattice, eta: float = None,
                 precision: float = 1e-10):
    """Ewald sum of point charges in a neutralizing background.

    Parity with the reference's nuclei-energy Ewald (sol.py:176-228):
    real-space + reciprocal-space + self + background terms. Differentiable
    w.r.t. atompos and atomzs."""
    import scipy.special  # noqa: F401  (doc only)
    from jax.scipy.special import erfc

    z = jnp.asarray(atomzs)
    pos = jnp.asarray(atompos)
    natm = pos.shape[0]
    vol = lattice.volume()
    if eta is None:
        eta = lattice.estimate_ewald_eta()
    # cutoffs from precision
    rcut = float(np.sqrt(-np.log(precision)) / eta * 1.2 + 1.0)
    gcut = float(2.0 * eta * np.sqrt(-np.log(precision)) * 1.2 + 1.0)

    ls = jnp.asarray(lattice.get_lattice_ls(rcut))             # (nL,3)
    gv_np, _ = lattice.get_gvgrids(gcut)
    gv = jnp.asarray(gv_np)

    # real-space: 1/2 sum_{i,j,L}' z_i z_j erfc(eta |r_ij + L|)/|r_ij + L|
    rij = pos[:, None, None, :] - pos[None, :, None, :] + ls[None, None, :, :]
    d = jnp.sqrt(jnp.sum(rij * rij, axis=-1) + 1e-300)
    # exclude the i==j, L==0 self term
    self_mask = ((jnp.sum(ls * ls, axis=-1) < 1e-20)[None, None, :]
                 & jnp.eye(natm, dtype=bool)[:, :, None])
    contrib = jnp.where(self_mask, 0.0, erfc(eta * d) / d)
    e_real = 0.5 * jnp.einsum("i,j,ijl->", z, z, contrib)

    # reciprocal: (2 pi / V) sum_{G != 0} |S(G)|^2 exp(-G^2/(4 eta^2))/G^2
    g2 = jnp.sum(gv * gv, axis=-1)
    nonzero = g2 > 1e-20
    phase = jnp.einsum("gd,ad->ga", gv, pos)
    sg_re = jnp.einsum("a,ga->g", z, jnp.cos(phase))
    sg_im = jnp.einsum("a,ga->g", z, jnp.sin(phase))
    s2 = sg_re ** 2 + sg_im ** 2
    g2_safe = jnp.where(nonzero, g2, 1.0)
    e_recip = (2.0 * jnp.pi / vol) * jnp.sum(
        jnp.where(nonzero, s2 * jnp.exp(-g2_safe / (4 * eta * eta)) / g2_safe,
                  0.0))

    # self + neutralizing background
    e_self = -eta / jnp.sqrt(jnp.pi) * jnp.sum(z * z)
    e_bg = -jnp.pi / (2.0 * eta * eta * vol) * jnp.sum(z) ** 2
    return e_real + e_recip + e_self + e_bg
