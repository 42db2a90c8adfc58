"""Minimal reproducer driver for the axon-TPU expand_k miscompile.

Observed (STATUS.md): the jitted f64 exchange-layout ERI expansion
(scf/jk.expand_k_tensor — advanced-index scatter-adds over 21 canonical
quartet-block combos + 3 transpose-adds) returns values with rel err
~4.8e-1 vs the host-numpy twin on the axon TPU at benzene def2-SVP
(1.35 GB) AND 3-21g (151 MB) scale, while the blocks-path contraction of
the same theta is correct to ~1e-14. This driver distills the failure:

  phase 1: real jk_meta (benzene/BASIS) + RANDOM block values —
           removes the integral math from the program entirely.
  phase 2: ablations — scatter only (no transpose-adds), transpose-adds
           only (on a random dense tensor), each combo alone.
  phase 3: shrink — first k combos only, k = 1..n.

Run on the TPU:      python tools/expand_k_repro.py [basis]
Sanity check (CPU):  env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/expand_k_repro.py
All comparisons are device-vs-numpy on identical inputs round-tripped
through host memory, so any disagreement is the backend's.
"""
import os
import sys

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rel(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300))


def expand(meta, jk_meta, blocks, combos_keep=None, transposes=True):
    """expand_k_tensor with ablation switches (mirrors scf/jk.py:234-263)."""
    from dqc_tpu.scf.jk import jk_combos
    nao = meta.nao
    out = jnp.zeros((nao, nao, nao, nao), dtype=blocks[0].dtype)
    for ci, (gi, gj) in enumerate(jk_combos(jk_meta)):
        if combos_keep is not None and ci not in combos_keep:
            continue
        ip, iq = jk_meta[gi], jk_meta[gj]
        sa, sb = ip["sa"], ip["sb"]
        sc, sd = iq["sa"], iq["sb"]
        ra = jnp.asarray(ip["row0"][:, None] + np.arange(sa))
        rb = jnp.asarray(ip["col0"][:, None] + np.arange(sb))
        rc = jnp.asarray(iq["row0"][:, None] + np.arange(sc))
        rd = jnp.asarray(iq["col0"][:, None] + np.arange(sd))
        out = out.at[ra[:, :, None, None, None, None],
                     rc[None, None, None, :, :, None],
                     rb[:, None, :, None, None, None],
                     rd[None, None, None, :, None, :]].add(blocks[ci])
    if transposes == "fused":
        # the original (miscompiling) form kept for regression probing:
        # XLA:TPU fuses f64 add+transpose(2,1,0,3) wrongly >= ~98 MB
        out = out + out.transpose(2, 1, 0, 3)
        out = out + out.transpose(0, 3, 2, 1)
        out = out + out.transpose(1, 0, 3, 2)
    elif transposes:
        # production form (scf/jk.expand_k_tensor): barrier forces the
        # bare-transpose kernel, which is correct at all sizes
        for perm in ((2, 1, 0, 3), (0, 3, 2, 1), (1, 0, 3, 2)):
            out = out + jax.lax.optimization_barrier(out.transpose(*perm))
    return out


def expand_host(meta, jk_meta, blocks, combos_keep=None, transposes=True):
    from dqc_tpu.scf.jk import jk_combos
    nao = meta.nao
    out = np.zeros((nao, nao, nao, nao), dtype=np.asarray(blocks[0]).dtype)
    flat = out.reshape(-1)
    for ci, (gi, gj) in enumerate(jk_combos(jk_meta)):
        if combos_keep is not None and ci not in combos_keep:
            continue
        ip, iq = jk_meta[gi], jk_meta[gj]
        sa, sb = ip["sa"], ip["sb"]
        sc, sd = iq["sa"], iq["sb"]
        ra = (np.asarray(ip["row0"])[:, None] + np.arange(sa)).astype(np.int64)
        rb = (np.asarray(ip["col0"])[:, None] + np.arange(sb)).astype(np.int64)
        rc = (np.asarray(iq["row0"])[:, None] + np.arange(sc)).astype(np.int64)
        rd = (np.asarray(iq["col0"])[:, None] + np.arange(sd)).astype(np.int64)
        A = ra[:, :, None, None, None, None]
        C = rc[None, None, None, :, :, None]
        B = rb[:, None, :, None, None, None]
        D = rd[None, None, None, :, None, :]
        idx = ((A * nao + C) * nao + B) * nao + D
        flat[idx.ravel()] += np.asarray(blocks[ci]).ravel()
    if transposes:
        out = out + out.transpose(2, 1, 0, 3)
        out = out + out.transpose(0, 3, 2, 1)
        out = out + out.transpose(1, 0, 3, 2)
    return out


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "3-21g"
    import dqc_tpu  # noqa: F401
    from dqc_tpu.scf import qccalc as qmod
    from dqc_tpu.scf.jk import jk_combos
    from __graft_entry__ import _benzene_mol

    mol = _benzene_mol(basis=basis)
    scr = qmod._screened(mol)
    qmod.DENSE_ERI_BYTES_LIMIT = 0   # force the blocked/stream jk_meta path
    mode, jk_info = qmod._jk_setup(mol, scr)
    assert jk_info is not None, mode
    bmeta, jk_meta = jk_info
    combos = jk_combos(jk_meta)
    print(f"backend={jax.default_backend()} basis={basis} nao={bmeta.nao} "
          f"ncombos={len(combos)} "
          f"tensor={bmeta.nao ** 4 * 8 / 1e6:.0f} MB")

    rng = np.random.RandomState(0)
    blocks_np = []
    for (gi, gj) in combos:
        ip, iq = jk_meta[gi], jk_meta[gj]
        shp = (len(ip["row0"]), ip["sa"], ip["sb"],
               len(iq["row0"]), iq["sa"], iq["sb"])
        blocks_np.append(rng.standard_normal(shp))
    blocks = [jnp.asarray(b) for b in blocks_np]

    # phase 1: full expansion, random data
    dev = np.asarray(jax.jit(lambda bl: expand(bmeta, jk_meta, bl))(blocks))
    host = expand_host(bmeta, jk_meta, blocks_np)
    r = rel(dev, host)
    print(f"[phase1] full expansion rel={r:.3e} -> "
          f"{'FAIL' if r > 1e-9 else 'ok'}")
    if r <= 1e-9:
        print("full expansion is correct on this backend with random data; "
              "if the production probe still fails, the corruption needs "
              "the real block values (dynamic range) — rerun SCF probes.")
        return

    # phase 2: ablations
    dev = np.asarray(jax.jit(
        lambda bl: expand(bmeta, jk_meta, bl, transposes=False))(blocks))
    host = expand_host(bmeta, jk_meta, blocks_np, transposes=False)
    print(f"[phase2] scatter-only rel={rel(dev, host):.3e}")

    x_np = rng.standard_normal((bmeta.nao,) * 4)
    x = jnp.asarray(x_np)

    @jax.jit
    def tr(o):
        o = o + o.transpose(2, 1, 0, 3)
        o = o + o.transpose(0, 3, 2, 1)
        o = o + o.transpose(1, 0, 3, 2)
        return o

    h = x_np + x_np.transpose(2, 1, 0, 3)
    h = h + h.transpose(0, 3, 2, 1)
    h = h + h.transpose(1, 0, 3, 2)
    print(f"[phase2] transpose-adds-only rel={rel(np.asarray(tr(x)), h):.3e}")

    # phase 3: shrink over combo prefixes
    for k in range(1, len(combos) + 1):
        keep = set(range(k))
        dev = np.asarray(jax.jit(
            lambda bl: expand(bmeta, jk_meta, bl, combos_keep=keep))(blocks))
        host = expand_host(bmeta, jk_meta, blocks_np, combos_keep=keep)
        r = rel(dev, host)
        print(f"[phase3] combos 0..{k - 1}: rel={r:.3e}"
              f"{'   <-- first failure' if r > 1e-9 else ''}")
        if r > 1e-9:
            break


if __name__ == "__main__":
    main()
