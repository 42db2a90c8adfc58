"""Re-derive STO-NG universal fit constants (Hehre-Stewart-Pople JCP 51,
2657 (1969) scheme): maximize sum of overlaps of the 3-Gaussian expansion
with the zeta=1 Slater 2s/2p (shared exponents), then 3s/3p.
Validate against the known 2sp constants, then print 3sp."""
import numpy as np
from scipy.optimize import minimize
import math

# radial STOs (normalized), n=principal quantum number: R_n(r) ~ r^{n-1} e^{-r}
def sto_norm(n):
    # \int_0^inf [N r^{n-1} e^{-r}]^2 r^2 dr = 1 -> N^2 (2n)!/2^{2n+1} = 1
    return math.sqrt(2.0**(2*n+1) / math.factorial(2*n))

# primitive Gaussian radial for angular momentum l: N r^l e^{-a r^2}
def gto_norm(l, a):
    # \int N^2 r^{2l} e^{-2 a r^2} r^2 dr = 1
    # \int_0^inf r^{2l+2} e^{-2ar^2} dr = (2l+1)!! sqrt(pi) / (2^{l+2} (2a)^{l+1} sqrt(2a))
    from math import pi, sqrt
    df = 1.0
    for k in range(2*l+1, 0, -2):
        df *= k
    val = df * sqrt(pi) / (2.0**(l+2) * (2*a)**(l+1) * sqrt(2*a))
    return 1.0/sqrt(val)

def overlap_sto_gto(n, l, a, ngrid=20000, rmax=60.0):
    # numeric radial integral of normalized STO(n) * normalized GTO(l)
    r = np.linspace(1e-8, rmax, ngrid)
    sto = sto_norm(n) * r**(n-1) * np.exp(-r)
    gto = gto_norm(l, a) * r**l * np.exp(-a*r*r)
    return np.trapezoid(sto*gto*r*r, r)

def gto_gto_overlap(l, a, b):
    # closed form: normalized primitives
    return (2*math.sqrt(a*b)/(a+b))**(l+1.5)

def fit(n_s, n_p, x0):
    """Shared exponents for ns & np: maximize S_s^2 + S_p^2 where S is the
    overlap of the normalized contraction with the STO."""
    def neg(params):
        la = params[:3]
        a = np.exp(la)
        cs = params[3:6]
        cp = params[6:9]
        out = 0.0
        for (n, l, c) in ((n_s, 0, cs), (n_p, 1, cp)):
            v = np.array([overlap_sto_gto(n, l, ai) for ai in a])
            Smat = np.array([[gto_gto_overlap(l, ai, aj) for aj in a] for ai in a])
            norm = math.sqrt(c @ Smat @ c)
            out += (c @ v / norm)**2
        return -out
    res = minimize(neg, x0, method="Nelder-Mead",
                   options={"maxiter": 20000, "xatol": 1e-12, "fatol": 1e-14})
    la = res.x[:3]; a = np.exp(la)
    # normalize coefficient conventions: scale so contraction is normalized
    outs = []
    for (n, l, c) in ((n_s, 0, res.x[3:6]), (n_p, 1, res.x[6:9])):
        Smat = np.array([[gto_gto_overlap(l, ai, aj) for aj in a] for ai in a])
        c = c / math.sqrt(c @ Smat @ c)
        outs.append(c)
    order = np.argsort(-a)
    return a[order], outs[0][order], outs[1][order], -res.fun

# validate on 2sp
a2, c2s, c2p, q = fit(2, 2, np.concatenate([np.log([1.0,0.23,0.075]),
                                            [-0.1,0.4,0.7],[0.16,0.6,0.4]]))
print("2sp exps:", a2, " known [0.994203 0.231031 0.0751386]")
print("2s c:", c2s, " known [-0.09996723 0.39951283 0.70011547]")
print("2p c:", c2p, " known [0.15591627 0.60768372 0.39195739]")
print("quality", q)

a3, c3s, c3p, q = fit(3, 3, np.concatenate([np.log([0.5,0.16,0.06]),
                                            [-0.2,0.2,0.9],[0.01,0.6,0.46]]))
print("3sp exps:", a3)
print("3s c:", c3s)
print("3p c:", c3p)
print("quality", q)
