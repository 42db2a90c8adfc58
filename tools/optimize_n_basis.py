"""Recover the N 3-21G basis parameters by atomic-energy minimization.

The 3-21G parameters were variationally optimized on atomic SCF energies
(Binkley, Pople, Hehre 1980); re-optimizing with our end-to-end
differentiable HF recovers them. This doubles as a demonstration of
basis-parameter gradients through the SCF implicit fixed point
(BASELINE.json config 4).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import optax

import dqc_tpu
from dqc_tpu.utils.datastruct import CGTOBasis

S3E = [242.7660000, 37.0489000, 8.0214700]
S3C = [0.0598657, 0.3529550, 0.7065130]
SPE = [5.9126400, 1.2650500]
CS = [-0.4133010, 1.2244200]
CP = [0.2379720, 0.8589530]
OUT = 0.2969170


def make_mol(params_flat):
    # not used inside jit; builds the Mol template once
    shells = [CGTOBasis(0, np.array(S3E), np.array(S3C)),
              CGTOBasis(0, np.array(SPE), np.array(CS)),
              CGTOBasis(1, np.array(SPE), np.array(CP)),
              CGTOBasis(0, np.array([OUT]), np.array([1.0])),
              CGTOBasis(1, np.array([OUT]), np.array([1.0]))]
    return dqc_tpu.Mol(([7], [[0., 0., 0.]]), basis=[shells], spin=3)


def main():
    mol = make_mol(None)
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()

    # pack: log-exponents for positivity; coeffs raw (normalization is
    # projective so overall scale is irrelevant)
    # class layout: l=0 shells rows [S3(3 prims), SP-s(2), OUT-s(1)],
    # l=1 rows [SP-p(2), OUT-p(1)]
    def set_basis(p, x):
        b = {k: list(v) if isinstance(v, list) else v
             for k, v in p0["basis"].items()}
        al0 = b["alphas"][0]
        al1 = b["alphas"][1]
        co0 = b["coeffs"][0]
        co1 = b["coeffs"][1]
        s3e = jnp.exp(x["log_s3e"])
        spe = jnp.exp(x["log_spe"])
        out = jnp.exp(x["log_out"])
        al0 = al0.at[0, :3].set(s3e).at[1, :2].set(spe).at[2, 0].set(out)
        al1 = al1.at[0, :2].set(spe).at[1, 0].set(out)
        co0 = co0.at[0, :3].set(x["s3c"]).at[1, :2].set(x["cs"])
        co1 = co1.at[0, :2].set(x["cp"])
        b["alphas"] = [al0, al1]
        b["coeffs"] = [co0, co1]
        q = dict(p)
        q["basis"] = b
        return q

    x0 = {"log_s3e": jnp.log(jnp.asarray(S3E)),
          "log_spe": jnp.log(jnp.asarray(SPE)),
          "log_out": jnp.log(jnp.asarray(OUT)),
          "s3c": jnp.asarray(S3C), "cs": jnp.asarray(CS),
          "cp": jnp.asarray(CP)}

    @jax.jit
    def loss(x):
        return qc.energy_fn(set_basis(p0, x))

    e0 = loss(x0)
    print(f"start N atom UHF: {float(e0):.8f}")
    x = x0
    best = (float(e0), x0)
    # stages with decreasing lr; on divergence restart from best with
    # halved lr (the SCF goes non-finite for some param combos)
    lr = 2e-3
    for stage in range(6):
        opt = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(lr))
        state = opt.init(x)
        vg = jax.jit(jax.value_and_grad(loss))
        bad = 0
        for i in range(800):
            e, g = vg(x)
            ev = float(e)
            if not np.isfinite(ev):
                bad += 1
                x = best[1]
                opt = optax.chain(optax.clip_by_global_norm(0.05),
                                  optax.adam(lr * 0.5))
                state = opt.init(x)
                if bad > 20:
                    break
                continue
            if ev < best[0]:
                best = (ev, x)
            up, state = opt.update(g, state)
            x = optax.apply_updates(x, up)
        print(f"stage {stage} (lr {lr:.1e}): best E = {best[0]:.8f}")
        lr *= 0.4
        x = best[1]
    x = best[1]
    e1 = loss(x)
    print(f"final N atom UHF: {float(e1):.8f}  (improvement {float(e0-e1)*1e3:.3f} mHa)")
    print("s3e:", np.exp(np.asarray(x["log_s3e"])))
    print("s3c:", np.asarray(x["s3c"]))
    print("spe:", np.exp(np.asarray(x["log_spe"])))
    print("cs:", np.asarray(x["cs"]))
    print("cp:", np.asarray(x["cp"]))
    print("out:", float(np.exp(x["log_out"])))


if __name__ == "__main__":
    main()
