"""External ejecta-model file readers.

Counterparts of the reference's reader zoo (/root/reference/tardis/io/model/
readers/: artis, stella, cmfgen): parse the foreign columnar formats into
(velocity_edges, density, abundances) ready for SimulationState assembly.
"""

from __future__ import annotations

import re

import numpy as np

from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS, SYMBOL_TO_Z
from tardis_tpu.model.density import density_after_time
from tardis_tpu.model.geometry import Radial1DGeometry
from tardis_tpu.model.state import Composition, SimulationState


def read_artis_density(path: str):
    """ARTIS model.txt: line1 = #shells, line2 = time [days], then rows
    (index, v_outer [km/s], log10(rho), ...)
    (reference io/model/readers/artis.py)."""
    with open(path) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    n_shells = int(lines[0])
    time_days = float(lines[1])
    rows = [list(map(float, ln.split())) for ln in lines[2 : 2 + n_shells]]
    rows = np.asarray(rows)
    v_outer = rows[:, 1] * 1e5  # cm/s
    density = 10.0 ** rows[:, 2]
    return time_days * 86400.0, v_outer, density


def read_stella_model(path: str):
    """STELLA .stl-like output: header rows then whitespace table with
    columns including 'mass of cell', 'cell center R', 'cell center v',
    'avg density' and element mass fractions
    (reference io/model/readers/stella.py)."""
    with open(path) as fh:
        content = fh.read()
    m = re.search(r"days post max Lbol\s+([-\d.eE+]+)", content)
    time_days = float(m.group(1)) if m else 0.0
    lines = content.splitlines()
    header_idx = None
    for i, ln in enumerate(lines):
        if "mass of cell" in ln or ("zone" in ln.lower() and "rho" in ln):
            header_idx = i
            break
    if header_idx is None:
        raise ValueError("could not locate STELLA table header")
    cols = re.split(r"\s{2,}", lines[header_idx].strip())
    data = []
    for ln in lines[header_idx + 1 :]:
        parts = ln.split()
        if not parts:
            continue
        try:
            data.append([float(x) for x in parts])
        except ValueError:
            break
    data = np.asarray(data)
    return time_days * 86400.0, cols, data


def simulation_state_from_artis(
    density_path: str,
    abundance_path: str,
    config,
) -> SimulationState:
    """ARTIS density + abundance files -> SimulationState.

    The abundance file has one row per shell with mass fractions for
    Z = 1..30 (reference readers/artis.py).
    """
    time_0, v_outer, density_0 = read_artis_density(density_path)
    abund = np.loadtxt(abundance_path)
    if abund.ndim == 1:
        abund = abund[None, :]
    # first column may be a shell index
    if abund.shape[1] in (31,):
        abund = abund[:, 1:]
    t_exp = config.supernova.time_explosion
    v_inner0 = v_outer[0] * 0.95  # ARTIS tabulates outer edges only
    edges = np.concatenate([[v_inner0], v_outer])
    geometry = Radial1DGeometry.from_velocity_grid(edges, t_exp)
    density = density_after_time(density_0, time_0, t_exp)

    zs = []
    fracs = []
    for z in range(1, min(31, abund.shape[1] + 1)):
        col = abund[:, z - 1]
        if np.any(col > 0):
            zs.append(z)
            fracs.append(col)
    mass_fractions = np.stack(fracs)
    norm = mass_fractions.sum(axis=0)
    mass_fractions /= np.where(norm > 0, norm, 1.0)

    from tardis_tpu.constants import B_WIEN, C, SIGMA_SB

    L = config.supernova.luminosity_requested
    r0 = geometry.r_inner[0]
    t_inner = float((L / (4.0 * np.pi * r0**2 * SIGMA_SB)) ** 0.25)
    t_radiative = B_WIEN / (
        (B_WIEN / t_inner)
        * (1.0 + (geometry.v_middle - geometry.v_inner[0]) / C)
    )
    return SimulationState(
        geometry=geometry,
        composition=Composition(
            atomic_numbers=np.asarray(zs),
            mass_fractions=mass_fractions,
            density=density,
        ),
        time_explosion=t_exp,
        luminosity_requested=L,
        t_inner=t_inner,
        t_radiative=t_radiative,
        dilution_factor=geometry.geometric_dilution_factor(),
    )
