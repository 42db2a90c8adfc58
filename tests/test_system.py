"""System-layer tests: occupations, fractional charge/spin, copies, cache
(parity intent: reference test_system.py)."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

import dqc_tpu
from dqc_tpu import Mol
from dqc_tpu.utils.cache import Cache


def test_orb_weights_closed_shell():
    mol = Mol("H -0.5 0 0; H 0.5 0 0", basis="sto-3g")
    w = np.asarray(mol.get_orb_weights())
    assert w[0] == 2.0 and w[1:].sum() == 0.0


def test_orb_weights_open_shell():
    mol = Mol("Li 0 0 0", basis="sto-3g", spin=1)
    w = mol.get_orb_weights()
    assert np.asarray(w.u).sum() == 2.0
    assert np.asarray(w.d).sum() == 1.0


def test_frac_charge_weights():
    mol = Mol("Li -2.5 0 0; Li 2.5 0 0", basis="sto-3g", charge=0.5,
              spin=0.5)
    w = mol.get_orb_weights()
    assert abs(float(np.asarray(w.u).sum() + np.asarray(w.d).sum())
               - 5.5) < 1e-12


def test_make_copy_moves_geometry():
    mol = Mol("H -0.5 0 0; H 0.5 0 0", basis="sto-3g")
    new_pos = jnp.asarray([[-0.7, 0, 0], [0.7, 0, 0]])
    mol2 = mol.make_copy(atompos=new_pos)
    np.testing.assert_allclose(np.asarray(mol2.params["atompos"]),
                               np.asarray(new_pos))
    assert mol2.meta.nao == mol.meta.nao


def test_cache_roundtrip(tmp_path):
    c = Cache(str(tmp_path / "t.npz"), signature="sig1")
    calls = []

    def compute():
        calls.append(1)
        return jnp.ones((3, 3))

    a = c.cache("m", compute)
    b = c.cache("m", compute)
    assert len(calls) == 1
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # fresh cache object, same file: served from disk
    c2 = Cache(str(tmp_path / "t.npz"), signature="sig1")
    d = c2.cache("m", compute)
    assert len(calls) == 1
    # signature mismatch: recompute with warning
    c3 = Cache(str(tmp_path / "t.npz"), signature="other")
    with pytest.warns(UserWarning):
        e = c3.cache("m", compute)
    assert len(calls) == 2


def test_set_cache_speeds_second_run(tmp_path):
    f = str(tmp_path / "theta.npz")
    mol = Mol("H -0.5 0 0; H 0.5 0 0", basis="sto-3g").set_cache(f)
    e1 = float(dqc_tpu.HF(mol).run().energy())
    assert os.path.exists(f)
    mol2 = Mol("H -0.5 0 0; H 0.5 0 0", basis="sto-3g").set_cache(f)
    e2 = float(dqc_tpu.HF(mol2).run().energy())
    assert abs(e1 - e2) < 1e-12


def test_units_roundtrip():
    from dqc_tpu.utils.units import (length_to_au, energy_to_au,
                                     FREQ_AU_TO_CM1, AU_TO_DEBYE)
    assert abs(length_to_au(1.0, "angst") - 1.8897261246258) < 1e-10
    assert abs(energy_to_au(27.211386245988, "ev") - 1.0) < 1e-10
    assert abs(FREQ_AU_TO_CM1 - 219474.63) / 219474.63 < 1e-4
    assert abs(AU_TO_DEBYE - 2.5417464) < 1e-5


def test_orb_weights_override():
    """Custom occupations (reference mol.py:144-168): explicit ground-state
    weights reproduce the default; promoting the electron raises E."""
    import dqc_tpu
    m = dqc_tpu.Mol("H 0 0 0; H 1.0 0 0", basis="3-21g")
    e_def = float(dqc_tpu.HF(m).run().energy())
    import numpy as np
    w = np.zeros(m.meta.nao); w[0] = 2.0
    m2 = dqc_tpu.Mol("H 0 0 0; H 1.0 0 0", basis="3-21g", orb_weights=w)
    assert abs(float(dqc_tpu.HF(m2).run().energy()) - e_def) < 1e-12
    w3 = np.zeros(m.meta.nao); w3[1] = 2.0
    m3 = dqc_tpu.Mol("H 0 0 0; H 1.0 0 0", basis="3-21g", orb_weights=w3)
    assert float(dqc_tpu.HF(m3).run().energy()) > e_def
