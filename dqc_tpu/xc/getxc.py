"""XC resolver: libxc-style names/expressions -> pure-JAX functionals.

Parity with the reference's get_xc (/root/reference/dqc/api/getxc.py) —
strings like "lda_x", "gga_x_pbe+gga_c_pbe", "0.25*hf+0.75*gga_x_b88" —
plus named hybrids (b3lyp/b3lyp5/pbe0) which the reference cannot run at all
(hybrids are not wired into its KS engine, SURVEY §2.7).
"""
from __future__ import annotations

import re

from .base import BaseXC, HFExchangeXC, LRHFExchangeXC
from .lda import LDA_X, LDA_C_PW, LDA_C_VWN5, LDA_C_VWN3, LDA_C_PZ, LDA_X_ERF
from .gga import (GGA_X_PBE, GGA_C_PBE, GGA_X_B88, GGA_C_LYP,
                  GGA_X_PBE_SOL, GGA_X_REVPBE, GGA_X_RPBE, GGA_C_PBE_SOL,
                  GGA_X_OPTX, GGA_X_ITYH_B88)

_REGISTRY = {
    "lda_x": LDA_X,
    "lda_c_pw": LDA_C_PW,
    "lda_c_pw_mod": LDA_C_PW,
    "lda_c_vwn": LDA_C_VWN5,
    "lda_c_vwn5": LDA_C_VWN5,
    "lda_c_vwn_rpa": LDA_C_VWN3,
    "lda_c_vwn3": LDA_C_VWN3,
    "lda_c_pz": LDA_C_PZ,
    "lda_c_pz_mod": LDA_C_PZ,
    "gga_x_pbe": GGA_X_PBE,
    "gga_c_pbe": GGA_C_PBE,
    "gga_x_pbe_sol": GGA_X_PBE_SOL,
    "gga_c_pbe_sol": GGA_C_PBE_SOL,
    "gga_x_pbe_r": GGA_X_REVPBE,   # libxc name for revPBE exchange
    "gga_x_rpbe": GGA_X_RPBE,
    "gga_x_b88": GGA_X_B88,
    "gga_c_lyp": GGA_C_LYP,
    "gga_x_optx": GGA_X_OPTX,
    "hf": HFExchangeXC,
}


def _mgga_registry():
    from .mgga import MGGA_X_SCAN, MGGA_C_SCAN, MGGA_X_TPSS, MGGA_C_TPSS
    return {"mgga_x_scan": MGGA_X_SCAN, "mgga_c_scan": MGGA_C_SCAN,
            "mgga_x_tpss": MGGA_X_TPSS, "mgga_c_tpss": MGGA_C_TPSS}


def _named_composites():
    return {
        # Gaussian-convention B3LYP (VWN3/RPA) — libxc hyb_gga_xc_b3lyp
        "b3lyp": lambda: (0.2 * HFExchangeXC() + 0.08 * LDA_X()
                          + 0.72 * GGA_X_B88() + 0.19 * LDA_C_VWN3()
                          + 0.81 * GGA_C_LYP()),
        "b3lyp5": lambda: (0.2 * HFExchangeXC() + 0.08 * LDA_X()
                           + 0.72 * GGA_X_B88() + 0.19 * LDA_C_VWN5()
                           + 0.81 * GGA_C_LYP()),
        "pbe0": lambda: (0.25 * HFExchangeXC() + 0.75 * GGA_X_PBE()
                         + GGA_C_PBE()),
        "pbe": lambda: GGA_X_PBE() + GGA_C_PBE(),
        "pbesol": lambda: GGA_X_PBE_SOL() + GGA_C_PBE_SOL(),
        "revpbe": lambda: GGA_X_REVPBE() + GGA_C_PBE(),
        "rpbe": lambda: GGA_X_RPBE() + GGA_C_PBE(),
        "blyp": lambda: GGA_X_B88() + GGA_C_LYP(),
        "olyp": lambda: GGA_X_OPTX() + GGA_C_LYP(),
        "bhandhlyp": lambda: (0.5 * HFExchangeXC() + 0.5 * GGA_X_B88()
                              + GGA_C_LYP()),
        # CAM-B3LYP (Yanai, Tew, Handy CPL 393, 51 (2004); libxc
        # hyb_gga_xc_cam_b3lyp): exact-exchange profile a(r12) = alpha +
        # beta*erf(omega r12) with alpha=0.19, beta=0.46, omega=0.33; the
        # DFT-exchange complement is (1-alpha-beta)*B88 + beta*SR-B88
        # (ITYH attenuation); correlation 0.19 VWN5 + 0.81 LYP
        "camb3lyp": lambda: (0.19 * HFExchangeXC()
                             + 0.46 * LRHFExchangeXC(0.33)
                             + 0.35 * GGA_X_B88()
                             + 0.46 * GGA_X_ITYH_B88(0.33)
                             + 0.19 * LDA_C_VWN5() + 0.81 * GGA_C_LYP()),
        "cam-b3lyp": lambda: _named_composites()["camb3lyp"](),
        # LC-BLYP (libxc hyb_gga_xc_lc_blyp, omega=0.30): pure long-range
        # correction — 100% LR exact exchange + SR-B88 + LYP
        "lc-blyp": lambda: (LRHFExchangeXC(0.30)
                            + GGA_X_ITYH_B88(0.30) + GGA_C_LYP()),
        "lc_blyp": lambda: _named_composites()["lc-blyp"](),
        "svwn": lambda: LDA_X() + LDA_C_VWN5(),
        "scan": lambda: get_libxc("mgga_x_scan") + get_libxc("mgga_c_scan"),
        "tpss": lambda: get_libxc("mgga_x_tpss") + get_libxc("mgga_c_tpss"),
        # meta-GGA hybrids (libxc hyb_mgga_xc_tpssh / mgga-scan0): 10% /
        # 25% exact exchange on the TPSS / SCAN parent
        "tpssh": lambda: (0.10 * HFExchangeXC()
                          + 0.90 * get_libxc("mgga_x_tpss")
                          + get_libxc("mgga_c_tpss")),
        "scan0": lambda: (0.25 * HFExchangeXC()
                          + 0.75 * get_libxc("mgga_x_scan")
                          + get_libxc("mgga_c_scan")),
        "lda": lambda: LDA_X() + LDA_C_PW(),
    }


# range-separation-parameterized functionals: name(omega), e.g.
# "lr_hf(0.33)" (long-range exact exchange, erf kernel), "sr_hf(0.11)"
# (= hf - lr_hf: HSE-class screened exact exchange), "lda_x_erf(0.33)"
# (short-range Slater exchange). These compose into LC/CAM/HSE-class
# range-separated hybrids — entirely beyond the reference, whose KS engine
# supports no exact exchange at all (ks.py:176-187).
_OMEGA_REGISTRY = {
    "lr_hf": LRHFExchangeXC,
    "sr_hf": lambda w: HFExchangeXC() + (-1.0) * LRHFExchangeXC(w),
    "lda_x_erf": LDA_X_ERF,
    # short-range (erfc) B88 via the ITYH exchange-hole attenuation —
    # the DFT-exchange complement for CAM/LC-class hybrids
    "gga_x_ityh_b88": GGA_X_ITYH_B88,
}


def get_libxc(name: str) -> BaseXC:
    key = name.strip().lower()
    if key in _REGISTRY:
        return _REGISTRY[key]()
    if key.startswith("mgga"):
        reg = _mgga_registry()
        if key in reg:
            return reg[key]()
    m = re.match(r"^([a-z0-9_]+)\(([0-9.eE+-]+)\)$", key)
    if m and m.group(1) in _OMEGA_REGISTRY:
        try:
            omega = float(m.group(2))
        except ValueError:
            omega = None   # malformed omega (e.g. '0.3.3') -> not-impl msg
        if omega is not None:
            return _OMEGA_REGISTRY[m.group(1)](omega)
    raise NotImplementedError(
        f"XC functional {name!r} not implemented; available: "
        f"{sorted(_REGISTRY)} + mgga_[xc]_scan, mgga_[xc]_tpss + "
        f"{sorted(_OMEGA_REGISTRY)} (omega-parameterized, e.g. 'lr_hf(0.33)')")


def get_xc(expr) -> BaseXC:
    """Resolve an XC spec: BaseXC instance, name, or +/- scaled expression."""
    if isinstance(expr, BaseXC):
        return expr
    s = expr.strip().lower()
    named = _named_composites()
    if s in named:
        return named[s]()
    # expression: terms like "0.25*hf + 0.75*gga_x_b88" or "lda_x+lda_c_pw".
    # Split on '+' only at paren depth 0 so omegas written in exponent-plus
    # notation ('lr_hf(1e+4)') survive intact.
    terms, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "+" and depth == 0:
            terms.append(s[start:i])
            start = i + 1
    terms.append(s[start:])
    out = None
    for term in terms:
        term = term.strip()
        if not term:
            continue
        m = re.match(r"^([0-9.eE+-]+)\s*\*\s*"
                     r"([a-z0-9_]+(?:\([0-9.eE+-]+\))?)$", term)
        if m:
            xc = float(m.group(1)) * get_libxc(m.group(2))
        else:
            xc = get_libxc(term)
        out = xc if out is None else out + xc
    if out is None:
        raise ValueError(f"Empty XC expression: {expr!r}")
    return out
