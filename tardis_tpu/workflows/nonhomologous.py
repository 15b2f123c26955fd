"""Nonhomologous-expansion workflow.

Counterpart of the reference's ``NonhomologousTARDISWorkflow``
(/root/reference/tardis/workflows/nonhomologous_tardis_workflow.py:33):
the standard convergence workflow with the geometry promoted to an
arbitrary piecewise-linear velocity law and the transport/opacity solvers
swapped for their nonhomologous variants.  As in the reference, the
geometry is *initialised* homologously (r = v * t_exp,
nonhomologous_tardis_workflow.py:68-79); callers may then assign any
``v_inner``/``v_outer`` arrays (e.g. from a CSVY model or hydro snapshot)
before ``run()``.
"""

from __future__ import annotations

from tardis_tpu.model.geometry import NonhomologousRadial1DGeometry
from tardis_tpu.transport.solver import NonhomologousTransportSolver
from tardis_tpu.workflows.simple import StandardTARDISWorkflow


class NonhomologousTARDISWorkflow(StandardTARDISWorkflow):
    def __init__(self, config, atom_data=None, show_convergence_plots=False,
                 show_progress_bars=True):
        super().__init__(
            config,
            atom_data=atom_data,
            show_convergence_plots=show_convergence_plots,
            show_progress_bars=show_progress_bars,
        )
        sim = self.sim
        sim.state.geometry = NonhomologousRadial1DGeometry.from_homologous(
            sim.state.geometry
        )
        old = sim.transport
        if old.enable_full_relativity:
            # the reference rejects this combination too
            # (modes/nonhomologous/packet_propagation.py:102-104)
            raise NotImplementedError(
                "Full relativity not supported for non-homology."
            )
        sim.transport = NonhomologousTransportSolver(
            line_interaction_type=old.line_interaction_type,
            disable_electron_scattering=old.disable_electron_scattering,
            disable_line_scattering=old.disable_line_scattering,
            batch_size=old.batch_size,
            w_epsilon=old.w_epsilon,
            track_last_interaction=old.track_last_interaction,
            track_rpacket_length=old.track_rpacket_length,
            inner_boundary_albedo=old.inner_boundary_albedo,
        )

    @property
    def geometry(self) -> NonhomologousRadial1DGeometry:
        return self.sim.state.geometry
