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

// Walker alias tables for a batch of row distributions (classic Vose,
// one row per task).  p: (R, M) f64; writes prob (R, M) f32 and
// alias (R, M) i32.  Rows with no mass become uniform.  This is the hot
// host step of the absorbing-chain macro-atom build (R = S*M rows at
// kurucz scale): the lockstep-numpy construction it replaces cost ~0.8 s
// per (M, M) block; per-row C++ is ~100x faster and OpenMP-parallel.
void alias_rows(const double* p, int64_t R, int64_t M,
                float* prob, int32_t* alias) {
#pragma omp parallel
  {
    double* q = new double[M];
    int64_t* small_s = new int64_t[M];
    int64_t* large_s = new int64_t[M];
#pragma omp for schedule(static)
    for (int64_t r = 0; r < R; ++r) {
      const double* row = p + r * M;
      float* prow = prob + r * M;
      int32_t* arow = alias + r * M;
      double tot = 0.0;
      for (int64_t i = 0; i < M; ++i) tot += row[i];
      if (tot <= 0.0) {
        for (int64_t i = 0; i < M; ++i) {
          q[i] = 1.0;
        }
      } else {
        double scale = (double)M / tot;
        for (int64_t i = 0; i < M; ++i) q[i] = row[i] * scale;
      }
      int64_t ns = 0, nl = 0;
      for (int64_t i = 0; i < M; ++i) {
        if (q[i] < 1.0) small_s[ns++] = i;
        else large_s[nl++] = i;
      }
      while (ns > 0 && nl > 0) {
        int64_t s = small_s[--ns];
        int64_t l = large_s[nl - 1];
        prow[s] = (float)q[s];
        arow[s] = (int32_t)l;
        q[l] -= (1.0 - q[s]);
        if (q[l] < 1.0) {
          --nl;
          small_s[ns++] = l;
        }
      }
      while (nl > 0) {
        int64_t l = large_s[--nl];
        prow[l] = 1.0f;
        arow[l] = (int32_t)l;
      }
      while (ns > 0) {  // numerical leftovers
        int64_t s = small_s[--ns];
        prow[s] = 1.0f;
        arow[s] = (int32_t)s;
      }
    }
    delete[] q;
    delete[] small_s;
    delete[] large_s;
  }
}

// Interleaved variant used by the absorbing-chain build: writes the
// kernel-ready (R, M, 2) float32 layout [prob | alias-as-float] in one
// pass, folding in the clip-to-nonnegative and row normalization that
// the Python caller otherwise pays as separate (R, M) passes.  Rows with
// no mass self-deactivate (prob 1, alias self).
void alias_rows_interleaved(const double* p, int64_t R, int64_t M,
                            float* out) {
#pragma omp parallel
  {
    double* q = new double[M];
    int64_t* small_s = new int64_t[M];
    int64_t* large_s = new int64_t[M];
#pragma omp for schedule(static)
    for (int64_t r = 0; r < R; ++r) {
      const double* row = p + r * M;
      float* orow = out + r * M * 2;
      double tot = 0.0;
      for (int64_t i = 0; i < M; ++i) {
        double v = row[i] > 0.0 ? row[i] : 0.0;
        q[i] = v;
        tot += v;
      }
      if (tot <= 0.0) {
        // degenerate: self-deactivation
        for (int64_t i = 0; i < M; ++i) {
          orow[2 * i] = 1.0f;
          orow[2 * i + 1] = (float)i;
        }
        continue;
      }
      double scale = (double)M / tot;
      for (int64_t i = 0; i < M; ++i) q[i] *= scale;
      int64_t ns = 0, nl = 0;
      for (int64_t i = 0; i < M; ++i) {
        if (q[i] < 1.0) small_s[ns++] = i;
        else large_s[nl++] = i;
      }
      while (ns > 0 && nl > 0) {
        int64_t s = small_s[--ns];
        int64_t l = large_s[nl - 1];
        orow[2 * s] = (float)q[s];
        orow[2 * s + 1] = (float)l;
        q[l] -= (1.0 - q[s]);
        if (q[l] < 1.0) {
          --nl;
          small_s[ns++] = l;
        }
      }
      while (nl > 0) {
        int64_t l = large_s[--nl];
        orow[2 * l] = 1.0f;
        orow[2 * l + 1] = (float)l;
      }
      while (ns > 0) {
        int64_t s = small_s[--ns];
        orow[2 * s] = 1.0f;
        orow[2 * s + 1] = (float)s;
      }
    }
    delete[] q;
    delete[] small_s;
    delete[] large_s;
  }
}

int openmp_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
