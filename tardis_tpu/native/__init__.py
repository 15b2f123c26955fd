"""ctypes bindings for the native host pipeline (libhost_pipeline.so).

Falls back to numpy implementations transparently when the shared library
hasn't been built (``make -C tardis_tpu/native``); `build()` compiles it
on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhost_pipeline.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"] + (["clean", "all"] if force else []),
            check=True,
            capture_output=True,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64

    lib.prefix_split.argtypes = [f64p, i64, i64, f32p, f32p]
    lib.macro_cum_probs.argtypes = [
        f64p, i32p, i8p, f64p, f64p, f64p, i32p, i64, i64, i64, f32p,
    ]
    lib.tau_and_beta.argtypes = [
        f64p, f64p, f64p, ctypes.c_double, i64, i64, f64p, f64p,
    ]
    lib.line_plasma_tables.argtypes = [
        f64p, i32p, i32p, f64p, f64p, f64p, f64p, f64p, f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, i64, i64,
        f64p, f64p, f64p, f64p,
    ]
    lib.line_plasma_tables.restype = ctypes.c_int
    if hasattr(lib, "line_plasma_tables2"):
        lib.line_plasma_tables2.argtypes = [
            f64p, i32p, i32p, f64p, f64p, f64p, f64p, f64p, f64p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, i64, i64,
            f64p, f64p, f64p, f64p, f32p, f32p, f32p, f32p, f32p,
        ]
        lib.line_plasma_tables2.restype = ctypes.c_int
    lib.openmp_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def prefix_split(tau: np.ndarray):
    """(L, S) f64 -> ((S, L+1) hi f32, (S, L+1) lo f32)."""
    lib = _load()
    L, S = tau.shape
    if lib is None:
        cum = np.zeros((S, L + 1), dtype=np.float64)
        np.cumsum(np.ascontiguousarray(tau.T), axis=1, out=cum[:, 1:])
        hi = cum.astype(np.float32)
        lo = (cum - hi.astype(np.float64)).astype(np.float32)
        return hi, lo
    tau = np.ascontiguousarray(tau, dtype=np.float64)
    hi = np.empty((S, L + 1), dtype=np.float32)
    lo = np.empty((S, L + 1), dtype=np.float32)
    lib.prefix_split(tau, L, S, hi, lo)
    return hi, lo


def macro_cum_probs(coef, line_idx, ttype, beta, jblue, stim, refs):
    """Fused macro-atom cumulative block probabilities -> (T, S) f32."""
    lib = _load()
    T = len(coef)
    M = len(refs) - 1
    S = beta.shape[1]
    if lib is None:
        return None  # caller falls back to the numpy path
    out = np.empty((T, S), dtype=np.float32)
    lib.macro_cum_probs(
        np.ascontiguousarray(coef, np.float64),
        np.ascontiguousarray(line_idx, np.int32),
        np.ascontiguousarray(ttype, np.int8),
        np.ascontiguousarray(beta, np.float64),
        np.ascontiguousarray(jblue, np.float64),
        np.ascontiguousarray(stim, np.float64),
        np.ascontiguousarray(refs, np.int32),
        T, M, S, out,
    )
    return out


def line_plasma_tables(level_pop, lower_idx, upper_idx, g_lower, g_upper,
                       wl_flu, line_nu, t_rad, w, coeff_texp, h_over_k,
                       two_h_over_c2):
    """Fused stim + tau_sobolev + beta_sobolev + dilute-Planck j_blues.

    level_pop (Nlev, S) f64; line arrays (L,); t_rad/w (S,).  Returns
    (stim, tau, beta, jb) each (L, S) f64, or None when the native
    library is unavailable.  Raises on non-finite tau (matching
    lte.tau_sobolev's guard)."""
    lib = _load()
    if lib is None:
        return None
    level_pop = np.ascontiguousarray(level_pop, np.float64)
    L = len(wl_flu)
    S = level_pop.shape[1]
    stim = np.empty((L, S))
    tau = np.empty((L, S))
    beta = np.empty((L, S))
    jb = np.empty((L, S))
    bad = lib.line_plasma_tables(
        level_pop,
        np.ascontiguousarray(lower_idx, np.int32),
        np.ascontiguousarray(upper_idx, np.int32),
        np.ascontiguousarray(g_lower, np.float64),
        np.ascontiguousarray(g_upper, np.float64),
        np.ascontiguousarray(wl_flu, np.float64),
        np.ascontiguousarray(line_nu, np.float64),
        np.ascontiguousarray(t_rad, np.float64),
        np.ascontiguousarray(w, np.float64),
        float(coeff_texp), float(h_over_k), float(two_h_over_c2),
        L, S, stim, tau, beta, jb,
    )
    if bad:
        raise ValueError("non-finite tau_sobolev")
    return stim, tau, beta, jb


def line_plasma_tables_full(level_pop, lower_idx, upper_idx, g_lower,
                            g_upper, wl_flu, line_nu, t_rad, w, coeff_texp,
                            h_over_k, two_h_over_c2):
    """line_plasma_tables + f32 copies + fused two-float tau prefix.

    Returns (stim, tau, beta, jb, stim32, beta32, jb32, pref_hi, pref_lo)
    or None when the native library (or the round-5 entry point) is
    unavailable.  The f32 copies are bit-identical to ``astype(float32)``
    of the f64 outputs; pref_hi/lo match ``prefix_split(tau)``.  One
    OpenMP sweep replaces the separate numpy casts (~0.2 s/iteration on
    this host) and the prefix pass's second full read of tau.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "line_plasma_tables2"):
        return None
    level_pop = np.ascontiguousarray(level_pop, np.float64)
    L = len(wl_flu)
    S = level_pop.shape[1]
    stim = np.empty((L, S))
    tau = np.empty((L, S))
    beta = np.empty((L, S))
    jb = np.empty((L, S))
    stim32 = np.empty((L, S), np.float32)
    beta32 = np.empty((L, S), np.float32)
    jb32 = np.empty((L, S), np.float32)
    pref_hi = np.empty((S, L + 1), np.float32)
    pref_lo = np.empty((S, L + 1), np.float32)
    bad = lib.line_plasma_tables2(
        level_pop,
        np.ascontiguousarray(lower_idx, np.int32),
        np.ascontiguousarray(upper_idx, np.int32),
        np.ascontiguousarray(g_lower, np.float64),
        np.ascontiguousarray(g_upper, np.float64),
        np.ascontiguousarray(wl_flu, np.float64),
        np.ascontiguousarray(line_nu, np.float64),
        np.ascontiguousarray(t_rad, np.float64),
        np.ascontiguousarray(w, np.float64),
        float(coeff_texp), float(h_over_k), float(two_h_over_c2),
        L, S, stim, tau, beta, jb, stim32, beta32, jb32, pref_hi, pref_lo,
    )
    if bad:
        raise ValueError("non-finite tau_sobolev")
    return stim, tau, beta, jb, stim32, beta32, jb32, pref_hi, pref_lo


def tau_and_beta(wl_flu, stim, n_lower, coeff_texp):
    """Fused tau_sobolev + beta_sobolev -> ((L,S) f64, (L,S) f64)."""
    lib = _load()
    if lib is None:
        return None
    L, S = stim.shape
    tau = np.empty((L, S), dtype=np.float64)
    beta = np.empty((L, S), dtype=np.float64)
    lib.tau_and_beta(
        np.ascontiguousarray(wl_flu, np.float64),
        np.ascontiguousarray(stim, np.float64),
        np.ascontiguousarray(n_lower, np.float64),
        float(coeff_texp), L, S, tau, beta,
    )
    return tau, beta
