"""Last-line-interaction analysis.

Counterpart of the reference's ``LastLineInteraction``
(/root/reference/tardis/analysis.py:18): filter escaped packets by a
wavelength window and tabulate the lines / species of their last interaction.
Works from the kernel's last-interaction tracking arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS
from tardis_tpu.constants import C


class LastLineInteraction:
    def __init__(self, transport_result, atom_data,
                 packet_filter_mode: str = "packet_out_nu"):
        if transport_result.last_interaction is None:
            raise ValueError(
                "transport was run without last-interaction tracking"
            )
        self.result = transport_result
        self.atom = atom_data
        self.packet_filter_mode = packet_filter_mode
        self.wavelength_start = 0.0
        self.wavelength_end = np.inf

    @classmethod
    def from_simulation(cls, sim, **kwargs):
        return cls(sim.last_transport_result, sim.atom_data, **kwargs)

    def set_wavelength_range(self, start_cm: float, end_cm: float):
        self.wavelength_start = start_cm
        self.wavelength_end = end_cm
        return self

    def _mask(self):
        res = self.result
        li = res.last_interaction
        emitted = res.output_status == 1
        line_mask = li["type"] == 2
        if self.packet_filter_mode == "packet_out_nu":
            nu = res.output_nu
        else:  # packet_in_nu: lab nu just before the last interaction
            nu = li["in_nu"]
        nu_min = C / self.wavelength_end if self.wavelength_end > 0 else 0.0
        nu_max = (
            C / self.wavelength_start if self.wavelength_start > 0 else np.inf
        )
        return emitted & line_mask & (nu > nu_min) & (nu < nu_max)

    @property
    def last_line_in(self) -> pd.DataFrame:
        """Counts per absorbed line (Z, ion, line id)."""
        m = self._mask()
        lines = self.result.last_interaction["in_line"][m]
        return self._line_table(lines)

    @property
    def last_line_out(self) -> pd.DataFrame:
        """Counts per emitted line."""
        m = self._mask()
        lines = self.result.last_interaction["out_line"][m]
        return self._line_table(lines)

    def _line_table(self, line_ids) -> pd.DataFrame:
        line_ids = line_ids[line_ids >= 0]
        uniq, counts = np.unique(line_ids, return_counts=True)
        atom = self.atom
        df = pd.DataFrame(
            {
                "line_id": uniq,
                "count": counts,
                "atomic_number": atom.line_z[uniq],
                "ion_number": atom.line_ion[uniq],
                "wavelength_AA": (C / atom.line_nu[uniq]) * 1e8,
            }
        )
        df["species"] = [
            f"{ATOMIC_SYMBOLS[z - 1]} {_roman(i + 1)}"
            for z, i in zip(df.atomic_number, df.ion_number)
        ]
        return df.sort_values("count", ascending=False).reset_index(drop=True)

    def species_counts(self) -> pd.Series:
        df = self.last_line_out
        return df.groupby("species")["count"].sum().sort_values(
            ascending=False
        )


_ROMAN = [
    "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
    "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII", "XIX", "XX",
]


def _roman(n: int) -> str:
    return _ROMAN[n - 1] if 1 <= n <= len(_ROMAN) else str(n)
