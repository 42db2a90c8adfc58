// Host-side integral planner: shell-pair enumeration, Schwarz screening,
// scatter-index generation.
//
// This is the TPU-native analog of the reference's C-side environment
// assembly and pair bookkeeping (libcint's shell-pair loops inside
// GTOnr2e_fill_drv etc., /root/reference/dqc/hamilton/intor/molintor.py
// drives them). Device compute stays in XLA; the planner produces the
// static index sets that parameterize the compiled programs.
//
// Exposed via a plain C ABI for ctypes (no pybind dependency).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Enumerate shell pairs for a class pair.
// mode 0: full cross product (na x nb)
// mode 1: upper triangle including diagonal (same class, na == nb)
// Returns the number of pairs written. ia/ib must have capacity na*nb.
int64_t plan_pairs(int64_t na, int64_t nb, int32_t mode,
                   int32_t* ia, int32_t* ib) {
  int64_t n = 0;
  if (mode == 1) {
    for (int64_t i = 0; i < na; ++i)
      for (int64_t j = i; j < nb; ++j) {
        ia[n] = static_cast<int32_t>(i);
        ib[n] = static_cast<int32_t>(j);
        ++n;
      }
  } else {
    for (int64_t i = 0; i < na; ++i)
      for (int64_t j = 0; j < nb; ++j) {
        ia[n] = static_cast<int32_t>(i);
        ib[n] = static_cast<int32_t>(j);
        ++n;
      }
  }
  return n;
}

// Schwarz screening: keep pairs with q[i]*qmax >= thresh.
// q: (npair,) Schwarz bounds sqrt((ab|ab)); qmax: global max of ket side.
// Writes the surviving pair indices into keep_idx; returns survivor count.
int64_t prune_pairs(const double* q, int64_t npair, double qmax,
                    double thresh, int32_t* keep_idx) {
  int64_t n = 0;
  for (int64_t i = 0; i < npair; ++i) {
    if (q[i] * qmax >= thresh) keep_idx[n++] = static_cast<int32_t>(i);
  }
  return n;
}

// Flat scatter indices for a pair class into an (nao, nao) matrix:
// out[p, m, n] = (row0[p] + m) * nao + (col0[p] + n),
// out shape (npair * nsph_a * nsph_b,).
void pair_scatter_indices(const int32_t* row0, const int32_t* col0,
                          int64_t npair, int32_t nsph_a, int32_t nsph_b,
                          int64_t nao, int64_t* out) {
  int64_t k = 0;
  for (int64_t p = 0; p < npair; ++p) {
    const int64_t r0 = row0[p];
    const int64_t c0 = col0[p];
    for (int32_t m = 0; m < nsph_a; ++m) {
      const int64_t base = (r0 + m) * nao + c0;
      for (int32_t n = 0; n < nsph_b; ++n) out[k++] = base + n;
    }
  }
}

// Quartet scatter indices: out[pq, ab, cd] = idx_ab[p,ab]*nao2 + idx_cd[q,cd]
// for the given (p, q) pair lists. Sizes: np1*nab and np2*ncd flattened in.
void quartet_scatter_indices(const int64_t* idx_ab, int64_t np1, int64_t nab,
                             const int64_t* idx_cd, int64_t np2, int64_t ncd,
                             int64_t nao2, int64_t* out) {
  int64_t k = 0;
  for (int64_t p = 0; p < np1; ++p)
    for (int64_t a = 0; a < nab; ++a) {
      const int64_t base = idx_ab[p * nab + a] * nao2;
      for (int64_t q = 0; q < np2; ++q)
        for (int64_t c = 0; c < ncd; ++c)
          out[k++] = base + idx_cd[q * ncd + c];
    }
}

// dst = src + src.transpose(axes) for an (n,n,n,n) f64 tensor, where axes
// is one of the involutive s8 generators. numpy's strided ND-iterator runs
// this at ~5 MB/s at n~100 (244 s per pass at n=114); the blocked loops
// below run at memory speed (~1 s). Valid for any involution axes.
void transpose_add_4d(const double* src, double* dst, int64_t n,
                      const int32_t* axes) {
  const int64_t s[4] = {n * n * n, n * n, n, 1};
  const int64_t sp[4] = {s[axes[0]], s[axes[1]], s[axes[2]], s[axes[3]]};
  const int64_t B = 16;
  for (int64_t a0 = 0; a0 < n; a0 += B)
    for (int64_t b0 = 0; b0 < n; b0 += B)
      for (int64_t c0 = 0; c0 < n; c0 += B)
        for (int64_t d0 = 0; d0 < n; d0 += B) {
          const int64_t a1 = a0 + B < n ? a0 + B : n;
          const int64_t b1 = b0 + B < n ? b0 + B : n;
          const int64_t c1 = c0 + B < n ? c0 + B : n;
          const int64_t d1 = d0 + B < n ? d0 + B : n;
          for (int64_t a = a0; a < a1; ++a)
            for (int64_t b = b0; b < b1; ++b)
              for (int64_t c = c0; c < c1; ++c) {
                const int64_t dbase = ((a * n + b) * n + c) * n;
                const int64_t gbase = a * sp[0] + b * sp[1] + c * sp[2];
                for (int64_t d = d0; d < d1; ++d)
                  dst[dbase + d] = src[dbase + d] + src[gbase + d * sp[3]];
              }
        }
}

}  // extern "C"

