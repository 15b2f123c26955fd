"""SDEC decomposition (real + virtual modes, absorption, filtering),
per-vpacket tracking, live convergence plots (VERDICT round-1 items 9/10)."""

import copy

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.simulation.base import Simulation
from tardis_tpu.visualization.convergence import ConvergencePlots
from tardis_tpu.visualization.sdec import SDECPlotter, _parse_species_list

from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def sim(atom_data_prepared):
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["plasma"]["line_interaction_type"] = "macroatom"
    cfg["montecarlo"]["no_of_packets"] = 3000
    cfg["montecarlo"]["last_no_of_packets"] = 6000
    cfg["montecarlo"]["no_of_virtual_packets"] = 3
    cfg["montecarlo"]["iterations"] = 2
    cfg["spectrum"]["virtual"] = {"virtual_packet_logging": True}
    s = Simulation.from_config(
        config_from_dict(cfg), atom_data=atom_data_prepared
    )
    cp = ConvergencePlots()
    s.add_callback(cp.update)
    s.run_convergence()
    s.run_final()
    s._test_convergence_plots = cp
    return s


def test_vpacket_tracking_arrays(sim):
    """Per-vpacket records exist with reference naming and consistent
    totals (reference virt_packet_* properties)."""
    vp = sim.last_transport_result.vpackets
    assert vp is not None
    n = len(vp["virt_packet_nus"])
    assert n > 0
    for key in (
        "virt_packet_energies",
        "virt_packet_initial_rs",
        "virt_packet_initial_mus",
        "virt_packet_last_interaction_in_nu",
        "virt_packet_last_interaction_type",
        "virt_packet_last_line_interaction_out_id",
    ):
        assert len(vp[key]) == n, key
    assert (vp["virt_packet_nus"] > 0).all()
    assert (vp["virt_packet_energies"] > 0).all()
    # per-vpacket energies sum to the virtual spectrum histogram total
    res = sim.last_transport_result
    np.testing.assert_allclose(
        vp["virt_packet_energies"].sum(),
        res.virt_energy_hist.sum(),
        rtol=1e-3,
    )
    # types are the kernel codes (-1 birth, 1 escat, 2 line, 3 contproc)
    assert set(np.unique(vp["virt_packet_last_interaction_type"])) <= {
        -1, 1, 2, 3,
    }


def test_sdec_real_mode_with_absorption(sim):
    p = SDECPlotter(sim)
    emission, absorption = p._decompose(sim.spectrum_nu_edges, "real")
    assert "photosphere" in emission and "e-scattering" in emission
    species = [k for k in emission if k not in
               ("photosphere", "e-scattering")]
    assert species, "no per-species emission components"
    assert absorption, "no absorption components"
    # emission components sum to the in-range emitted luminosity
    total = sum(emission.values())
    edges = np.asarray(sim.spectrum_nu_edges)
    d_nu = np.abs(np.diff(edges))
    res = sim.last_transport_result
    m = res.output_status == 1
    in_rng = (res.output_nu >= edges.min()) & (res.output_nu < edges.max())
    L_in = res.output_energy[m & in_rng].sum() / res.time_of_simulation
    np.testing.assert_allclose((total * d_nu).sum(), L_in, rtol=1e-6)
    fig = p.generate_plot_mpl(packets_mode="real")
    assert fig is not None


def test_sdec_virtual_mode(sim):
    p = SDECPlotter(sim)
    emission, absorption = p._decompose(sim.spectrum_nu_edges, "virtual")
    total = sum(emission.values())
    d_nu = np.abs(np.diff(sim.spectrum_nu_edges))
    res = sim.last_transport_result
    # virtual emission decomposition sums to the virtual spectrum total
    np.testing.assert_allclose(
        (total * d_nu).sum(),
        res.virt_energy_hist.sum() / res.time_of_simulation,
        rtol=0.05,
    )
    fig = p.generate_plot_mpl(packets_mode="virtual")
    assert fig is not None


def test_sdec_species_filter_and_topn(sim):
    p = SDECPlotter(sim)
    keys = _parse_species_list(["Si II", "Ca", "S I-III"])
    assert (14, 1) in keys and (20, None) in keys and (16, 2) in keys
    emission, _ = p._decompose(
        sim.spectrum_nu_edges, "real",
        species_filter=_parse_species_list(["Si"]),
    )
    labels = [k for k in emission if k not in
              ("photosphere", "e-scattering")]
    assert all(lbl.startswith("Si") for lbl in labels), labels
    # top-N folding produces an "other" bucket
    em2, _ = p._decompose(sim.spectrum_nu_edges, "real", nelements=1)
    assert "other" in em2


def test_live_convergence_plots(sim):
    cp = sim._test_convergence_plots
    assert len(cp.iterations) >= 2
    assert cp.figure is not None
    assert len(cp.t_rad_traces) == len(cp.iterations)
    assert cp.l_requested > 0


def test_sdec_flux_mode_options(sim):
    """distance/observed_spectrum/show_modeled_spectrum/
    blackbody_photosphere options (reference sdec_plot.py:733-746;
    round-3 VERDICT item 7), validated against the plotter's own
    luminosity-mode output."""
    import matplotlib.pyplot as plt

    p = SDECPlotter(sim)
    wl, em_stack, *_rest, total = p._prep("real", None, None, None)
    MPC = 3.0856775814913673e24  # cm
    d = 10.0 * MPC
    obs = (wl, total / (4.0 * np.pi * d**2))

    fig = p.generate_plot_mpl(
        packets_mode="real",
        distance=d,
        observed_spectrum=obs,
        show_modeled_spectrum=True,
        blackbody_photosphere=True,
    )
    ax = fig.axes[0]
    labels = [ln.get_label() for ln in ax.get_lines()]
    assert "total" in labels
    assert "blackbody photosphere" in labels
    assert "observed" in labels
    assert "F_\\lambda" in ax.get_ylabel() or "F_" in ax.get_ylabel()
    # the modeled total in flux mode must equal the observed overlay we
    # constructed from it
    total_line = ax.get_lines()[[
        ln.get_label() for ln in ax.get_lines()
    ].index("total")]
    np.testing.assert_allclose(
        total_line.get_ydata(), obs[1], rtol=1e-12
    )
    plt.close(fig)

    # blackbody photosphere overlay is the t_inner Planck curve scaled to
    # the photosphere area: check the analytic value at one wavelength
    from tardis_tpu.constants import C as C_L
    from tardis_tpu.constants import H, K_B

    lam_cm = 5000e-8
    t = sim.state.t_inner
    r = sim.state.geometry.r_inner[0]
    b_lam = 2 * H * C_L**2 / lam_cm**5 / np.expm1(H * C_L / (lam_cm * K_B * t))
    expected = np.pi * b_lam * 4 * np.pi * r**2 * 1e-8
    got = p._photosphere_luminosity_lambda(np.array([5000.0]))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-12)

    # modeled spectrum can be hidden
    fig2 = p.generate_plot_mpl(
        packets_mode="real", show_modeled_spectrum=False,
        blackbody_photosphere=False,
    )
    labels2 = [ln.get_label() for ln in fig2.axes[0].get_lines()]
    assert "total" not in labels2
    assert "blackbody photosphere" not in labels2
    plt.close(fig2)

    # observed spectrum without distance is rejected (reference behavior)
    with pytest.raises(ValueError):
        p.generate_plot_mpl(packets_mode="real", observed_spectrum=obs)


def test_lineid_plotter_styles(sim):
    """Self-contained lineid plotter: all three styles annotate without
    overlap (reference visualization/tools/lineid_plotter.py)."""
    import matplotlib.pyplot as plt

    from tardis_tpu.visualization.lineid import lineid_plotter

    spec = sim.spectrum_real
    wl = 2.99792458e18 / np.asarray(spec.nu)
    y = np.asarray(spec.luminosity_nu)
    lines = [3950.0, 4000.0, 4020.0, 6150.0]  # two nearly-degenerate
    labels = ["Ca II", "Si II", "S II", "Si II 6355"]
    for style in ("top", "inside", "along"):
        fig, ax = plt.subplots()
        ax.plot(wl, y)
        lineid_plotter(ax, lines, labels, wl, y, style=style)
        anns = [a for a in ax.texts]
        assert len(anns) == len(lines)
        # de-overlap: label x-positions are separated
        xs = sorted(a.get_position()[0] for a in anns)
        seps = np.diff(xs)
        assert (seps > 1.0).all(), seps
        plt.close(fig)
    with pytest.raises(ValueError):
        fig, ax = plt.subplots()
        lineid_plotter(ax, lines, labels, wl, y, style="bogus")
    plt.close("all")
