// Native host-side per-iteration table pipeline.
//
// At kurucz scale (L ~ 5e5 lines, S ~ 20 shells) the per-iteration host work
// is dominated by building the transport tables: per-shell prefix sums of
// tau_sobolev with two-float splitting (~100 MB of traffic), and the
// macro-atom cumulative block probabilities (~250 MB).  numpy needs several
// temporaries and passes; these fused OpenMP kernels do each in one pass.
//
// This is the TPU-native analogue of the reference's OpacityState.to_numba
// packing step (/root/reference/tardis/opacities/opacity_state.py:157), which
// is tracked as its own benchmark in the reference suite
// (benchmarks/opacities_opacity_state.py:12-29).
//
// Build: make -C tardis_tpu/native   (produces libhost_pipeline.so)

#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// tau: (L, S) float64 line-major (numpy C-order [line][shell]).
// Writes hi/lo: (S, L+1) float32 per-shell inclusive prefix sums with a
// leading zero, split into two-float (hi + lo == f64 prefix sum).
void prefix_split(const double* tau, int64_t L, int64_t S,
                  float* hi, float* lo) {
#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < S; ++s) {
    double acc = 0.0;
    float* hrow = hi + s * (L + 1);
    float* lrow = lo + s * (L + 1);
    hrow[0] = 0.0f;
    lrow[0] = 0.0f;
    for (int64_t i = 0; i < L; ++i) {
      acc += tau[i * S + s];
      float h = (float)acc;
      hrow[i + 1] = h;
      lrow[i + 1] = (float)(acc - (double)h);
    }
  }
}

// Macro-atom transition probabilities, fused:
//   p_t = coef[t] * beta[line_idx[t]]         (all transitions)
//   p_t *= stim[line] * jblue[line]           (internal-up only, type == 1)
// then per source-level block [refs[m], refs[m+1]) cumulative-normalize,
// forcing the last entry to exactly 1 (categorical sampling closure).
// beta/jblue/stim: (L, S) float64 line-major.  out: (T, S) float32.
void macro_cum_probs(const double* coef, const int32_t* line_idx,
                     const int8_t* ttype, const double* beta,
                     const double* jblue, const double* stim,
                     const int32_t* refs, int64_t T, int64_t M, int64_t S,
                     float* out) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t m = 0; m < M; ++m) {
    int64_t b0 = refs[m], b1 = refs[m + 1];
    if (b1 <= b0) continue;
    for (int64_t s = 0; s < S; ++s) {
      double total = 0.0;
      for (int64_t t = b0; t < b1; ++t) {
        int64_t li = (int64_t)line_idx[t] * S + s;
        double p = coef[t] * beta[li];
        if (ttype[t] == 1) p *= stim[li] * jblue[li];
        total += p;
        out[t * S + s] = (float)total;  // unnormalized cumulative (pass 1)
      }
      float inv = (total > 0.0) ? (float)(1.0 / total) : 0.0f;
      if (total > 0.0) {
        for (int64_t t = b0; t < b1; ++t) out[t * S + s] *= inv;
      } else {
        for (int64_t t = b0; t < b1; ++t) out[t * S + s] = 1.0f;
      }
      out[(b1 - 1) * S + s] = 1.0f;
    }
  }
}

// Fused tau_sobolev + beta_sobolev:
//   tau[l,s] = coefficient * wl_flu[l] * t_exp * stim[l,s] * n_lower[l,s]
//   beta = (1 - exp(-tau)) / tau   (stable branches)
void tau_and_beta(const double* wl_flu, const double* stim,
                  const double* n_lower, double coeff_texp,
                  int64_t L, int64_t S, double* tau, double* beta) {
#pragma omp parallel for schedule(static)
  for (int64_t l = 0; l < L; ++l) {
    double c = coeff_texp * wl_flu[l];
    for (int64_t s = 0; s < S; ++s) {
      double t = c * stim[l * S + s] * n_lower[l * S + s];
      tau[l * S + s] = t;
      double b;
      if (t > 1e3) b = 1.0 / t;
      else if (t < 1e-4) b = 1.0 - 0.5 * t;
      else b = -std::expm1(-t) / t;
      beta[l * S + s] = b;
    }
  }
}

// Fully fused per-iteration line-plasma tables (round 4):
//   stim = clip(1 - g_l n_u / (g_u n_l), 0)        (no masers)
//   tau  = coeff_texp * wl_flu[l] * stim * n_l
//   beta = (1 - exp(-tau)) / tau                    (stable branches)
//   jb   = w[s] * 2h nu^3/c^2 / (exp(min(h nu / k T_rad[s], 700)) - 1)
// level_pop: (Nlev, S); all line arrays (L,); outputs (L, S).
// Replaces four separate numpy passes (~0.5 s/iteration at kurucz scale
// on this ~200 MB/s host) with one OpenMP sweep.
// Returns 0 on success, 1 if any tau is non-finite.
int line_plasma_tables(const double* level_pop, const int32_t* lower_idx,
                       const int32_t* upper_idx, const double* g_lower,
                       const double* g_upper, const double* wl_flu,
                       const double* line_nu, const double* t_rad,
                       const double* w, double coeff_texp,
                       double h_over_k, double two_h_over_c2,
                       int64_t L, int64_t S, double* stim, double* tau,
                       double* beta, double* jb) {
  int bad = 0;
#pragma omp parallel for schedule(static) reduction(|| : bad)
  for (int64_t l = 0; l < L; ++l) {
    const double* nl_row = level_pop + (int64_t)lower_idx[l] * S;
    const double* nu_row = level_pop + (int64_t)upper_idx[l] * S;
    double gl = g_lower[l], gu = g_upper[l];
    double c_tau = coeff_texp * wl_flu[l];
    double nu3 = two_h_over_c2 * line_nu[l] * line_nu[l] * line_nu[l];
    double x_nu = h_over_k * line_nu[l];
    for (int64_t s = 0; s < S; ++s) {
      double nl = nl_row[s];
      double ratio = (gl * nu_row[s]) / (gu * nl);
      double st = std::isfinite(ratio) ? 1.0 - ratio : 0.0;
      if (st < 0.0) st = 0.0;
      double t = c_tau * st * nl;
      if (!std::isfinite(t)) bad = 1;
      stim[l * S + s] = st;
      tau[l * S + s] = t;
      double b;
      if (t > 1e3) b = 1.0 / t;
      else if (t < 1e-4) b = 1.0 - 0.5 * t;
      else b = -std::expm1(-t) / t;
      beta[l * S + s] = b;
      double x = x_nu / t_rad[s];
      if (x > 700.0) x = 700.0;
      jb[l * S + s] = w[s] * nu3 / std::expm1(x);
    }
  }
  return bad;
}

// Round-5 extension of line_plasma_tables: same fused sweep, but ALSO
// emits (a) float32 copies of stim/beta/jb — the dtypes the device
// macro-chain build consumes, previously re-cast by numpy at ~0.2 s per
// iteration on this host — and (b) the per-shell two-float prefix split
// of tau (prefix_split fused in, saving a second full read of tau).
// All casts are round-to-nearest double->float, bit-identical to numpy's
// astype, so downstream trajectories are unchanged.
int line_plasma_tables2(const double* level_pop, const int32_t* lower_idx,
                        const int32_t* upper_idx, const double* g_lower,
                        const double* g_upper, const double* wl_flu,
                        const double* line_nu, const double* t_rad,
                        const double* w, double coeff_texp,
                        double h_over_k, double two_h_over_c2,
                        int64_t L, int64_t S, double* stim, double* tau,
                        double* beta, double* jb, float* stim32,
                        float* beta32, float* jb32, float* pref_hi,
                        float* pref_lo) {
  int bad = 0;
#pragma omp parallel for schedule(static) reduction(|| : bad)
  for (int64_t l = 0; l < L; ++l) {
    const double* nl_row = level_pop + (int64_t)lower_idx[l] * S;
    const double* nu_row = level_pop + (int64_t)upper_idx[l] * S;
    double gl = g_lower[l], gu = g_upper[l];
    double c_tau = coeff_texp * wl_flu[l];
    double nu3 = two_h_over_c2 * line_nu[l] * line_nu[l] * line_nu[l];
    double x_nu = h_over_k * line_nu[l];
    for (int64_t s = 0; s < S; ++s) {
      double nl = nl_row[s];
      double ratio = (gl * nu_row[s]) / (gu * nl);
      double st = std::isfinite(ratio) ? 1.0 - ratio : 0.0;
      if (st < 0.0) st = 0.0;
      double t = c_tau * st * nl;
      if (!std::isfinite(t)) bad = 1;
      stim[l * S + s] = st;
      tau[l * S + s] = t;
      double b;
      if (t > 1e3) b = 1.0 / t;
      else if (t < 1e-4) b = 1.0 - 0.5 * t;
      else b = -std::expm1(-t) / t;
      beta[l * S + s] = b;
      double x = x_nu / t_rad[s];
      if (x > 700.0) x = 700.0;
      double j = w[s] * nu3 / std::expm1(x);
      jb[l * S + s] = j;
      stim32[l * S + s] = (float)st;
      beta32[l * S + s] = (float)b;
      jb32[l * S + s] = (float)j;
    }
  }
  // fused prefix split (second pass over the just-written tau; replaces
  // the separate prefix_split call's full re-read)
#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < S; ++s) {
    double acc = 0.0;
    float* hrow = pref_hi + s * (L + 1);
    float* lrow = pref_lo + s * (L + 1);
    hrow[0] = 0.0f;
    lrow[0] = 0.0f;
    for (int64_t i = 0; i < L; ++i) {
      acc += tau[i * S + s];
      float h = (float)acc;
      hrow[i + 1] = h;
      lrow[i + 1] = (float)(acc - (double)h);
    }
  }
  return bad;
}

int openmp_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
