"""Radioactive decay chains and gamma-ray source sampling.

Counterpart of the reference's decay machinery
(/root/reference/tardis/energy_input/gamma_ray_channel.py, decay_radiation.py,
nuclear_energy_source.py, samplers.py), self-contained: the Ni56 -> Co56 ->
Fe56 chain with its principal gamma lines (NNDC evaluated data), Bateman
solutions for the populations, and packet sampling over shells x time.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tardis_tpu.constants import DAY

KEV = 1.602176634e-9  # erg

# half lives [s]
T_HALF_NI56 = 6.075 * DAY
T_HALF_CO56 = 77.236 * DAY
LAMBDA_NI56 = np.log(2.0) / T_HALF_NI56
LAMBDA_CO56 = np.log(2.0) / T_HALF_CO56

# principal gamma lines: (energy keV, photons per decay)
NI56_LINES = np.array(
    [
        [158.38, 0.988],
        [269.50, 0.365],
        [480.44, 0.365],
        [749.95, 0.495],
        [811.85, 0.860],
        [1561.80, 0.140],
    ]
)
CO56_LINES = np.array(
    [
        [511.00, 0.388],  # annihilation (2 x 0.194 positron fraction)
        [846.77, 0.999],
        [977.37, 0.014],
        [1037.84, 0.141],
        [1175.10, 0.023],
        [1238.29, 0.665],
        [1360.21, 0.043],
        [1771.35, 0.155],
        [2015.18, 0.030],
        [2034.76, 0.078],
        [2598.46, 0.169],
        [3253.42, 0.079],
    ]
)

ENERGY_PER_DECAY_NI56 = float((NI56_LINES[:, 0] * NI56_LINES[:, 1]).sum())
ENERGY_PER_DECAY_CO56 = float((CO56_LINES[:, 0] * CO56_LINES[:, 1]).sum())

M_NI56 = 55.942128 * 1.6605390666e-24  # g


def bateman_ni_co(n_ni0: np.ndarray, t: float):
    """Ni56 and Co56 numbers at time t from initial Ni56 numbers."""
    ni = n_ni0 * np.exp(-LAMBDA_NI56 * t)
    co = (
        n_ni0
        * LAMBDA_NI56
        / (LAMBDA_CO56 - LAMBDA_NI56)
        * (np.exp(-LAMBDA_NI56 * t) - np.exp(-LAMBDA_CO56 * t))
    )
    return ni, co


def decay_energy_per_shell(n_ni0: np.ndarray, t0: float, t1: float):
    """Gamma-ray energy [erg] emitted per shell in [t0, t1] by parent."""
    ni0, co0 = bateman_ni_co(n_ni0, t0)
    ni1, co1 = bateman_ni_co(n_ni0, t1)
    ni_decays = ni0 - ni1
    # Co decays = Co produced - Co net change
    co_decays = ni_decays - (co1 - co0)
    e_ni = ni_decays * ENERGY_PER_DECAY_NI56 * KEV
    e_co = co_decays * ENERGY_PER_DECAY_CO56 * KEV
    return e_ni, e_co


@dataclass
class GammaPacketPool:
    """Host-sampled initial gamma packets."""

    shell: np.ndarray  # (N,) int32
    radius_frac: np.ndarray  # (N,) fractional position within shell (volume)
    mu: np.ndarray  # (N,) direction cosine
    energy_kev: np.ndarray  # (N,) photon energy
    time: np.ndarray  # (N,) decay time [s]
    packet_energy: np.ndarray  # (N,) erg carried per packet
    total_energy: float  # erg


def sample_gamma_packets(
    n_packets: int,
    n_ni0_per_shell: np.ndarray,  # (S,) initial Ni56 numbers
    t_start: float,
    t_end: float,
    seed: int = 0,
    n_time_bins: int = 64,
) -> GammaPacketPool:
    """Sample decay gamma packets over (shell, time, parent, line).

    Packets carry equal energy = E_total / N (the reference's convention,
    main_gamma_ray_loop.py:145-260).
    """
    rng = np.random.RandomState(seed)
    S = len(n_ni0_per_shell)
    t_edges = np.logspace(np.log10(t_start), np.log10(t_end), n_time_bins + 1)

    # energy emitted per (shell, time bin, parent)
    e_ni = np.empty((S, n_time_bins))
    e_co = np.empty((S, n_time_bins))
    for b in range(n_time_bins):
        eni, eco = decay_energy_per_shell(
            n_ni0_per_shell, t_edges[b], t_edges[b + 1]
        )
        e_ni[:, b] = eni
        e_co[:, b] = eco
    weights = np.stack([e_ni, e_co])  # (2, S, B)
    total = weights.sum()
    p = (weights / total).reshape(-1)
    choice = rng.choice(len(p), size=n_packets, p=p)
    parent = choice // (S * n_time_bins)
    rem = choice % (S * n_time_bins)
    shell = rem // n_time_bins
    tbin = rem % n_time_bins

    time = t_edges[tbin] * (t_edges[tbin + 1] / t_edges[tbin]) ** rng.rand(
        n_packets
    )
    mu = 2.0 * rng.rand(n_packets) - 1.0
    radius_frac = rng.rand(n_packets) ** (1.0 / 3.0)

    energy_kev = np.empty(n_packets)
    for par, lines in ((0, NI56_LINES), (1, CO56_LINES)):
        m = parent == par
        if not m.any():
            continue
        pl = lines[:, 0] * lines[:, 1]
        pl = pl / pl.sum()
        idx = rng.choice(len(lines), size=int(m.sum()), p=pl)
        energy_kev[m] = lines[idx, 0]

    return GammaPacketPool(
        shell=shell.astype(np.int32),
        radius_frac=radius_frac,
        mu=mu,
        energy_kev=energy_kev,
        time=time,
        packet_energy=np.full(n_packets, total / n_packets),
        total_energy=float(total),
    )
