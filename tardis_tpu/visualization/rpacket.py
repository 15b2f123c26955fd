"""Animated r-packet trajectory plot (plotly) with a static mpl fallback.

Full counterpart of the reference's ``RPacketPlotter``
(/root/reference/tardis/visualization/tools/rpacket_plot.py): 2-D projected
trajectories of tracked packets through the shell structure, animated over
event steps with play/pause buttons and a step slider, interaction-type
color coding, and light/dark themes.  Works from the kernel's full tracker
arrays (``montecarlo.tracking.track_rpacket``), which record (r, nu, energy,
shell, event type, after-mu) per event.

The polar-angle propagation follows the reference's documented geometry
(rpacket_plot.py:450-531): at each step the angular advance is
``theta += acos(mu_prev)`` corrected by ``asin(r_prev sin(acos mu_prev)/r)``
with the inbound/outbound branch chosen by the radius change.
"""

from __future__ import annotations

import numpy as np

# event-type codes written by the kernel tracker (transport/kernel.py):
# 1 = e-scatter, 2 = line, 3 = boundary, 4 = continuum process; 0 = unused
_INTERACTION_PROPS = {
    0: {"text": "No Interaction", "color": "#2E86AB", "opacity": 0.8},
    3: {"text": "Boundary", "color": "#A23B72", "opacity": 0.8},
    2: {"text": "Line Interaction", "color": "#F18F01", "opacity": 0.8},
    1: {"text": "E-Scattering", "color": "#C73E1D", "opacity": 0.8},
    4: {"text": "Continuum", "color": "#6A4C93", "opacity": 0.8},
}

_THEMES = {
    "light": dict(
        plot_bgcolor="#fafafa", paper_bgcolor="#fafafa", font_color="#000",
        shells_line_color="black", photosphere_fillcolor="darkgrey",
        packet_line_color="darkslategrey", gridcolor="#fafafa",
    ),
    "dark": dict(
        plot_bgcolor="#000", paper_bgcolor="#000", font_color="#fafafa",
        shells_line_color="#555", photosphere_fillcolor="#222",
        packet_line_color="#888", gridcolor="#111",
    ),
}


class RPacketPlotter:
    """Animated 2-D r-packet trajectory visualization."""

    def __init__(self, sim, no_of_packets: int = 15):
        if no_of_packets <= 0:
            raise ValueError("no_of_packets must be positive")
        res = sim.last_transport_result
        if res is None or res.rpacket_tracker is None:
            raise AttributeError(
                "There is no rpacket_tracker in the simulation object. "
                "Enable montecarlo.tracking.track_rpacket in the "
                "configuration first."
            )
        self.sim = sim
        self.tracker = res.rpacket_tracker
        n_avail = self.tracker["r"].shape[0]
        self.no_of_packets = min(no_of_packets, n_avail)

    @classmethod
    def from_simulation(cls, sim, no_of_packets: int = 15):
        return cls(sim, no_of_packets=no_of_packets)

    # ------------------------------------------------------------------
    def _packet_steps(self, p):
        """Valid (r, mu, type) sequences for packet p in velocity units."""
        tr = self.tracker
        types = tr["type"][p]
        valid = types != 0
        r = tr["r"][p][valid]
        mu = tr["mu"][p][valid]
        ty = types[valid]
        t_exp = self.sim.state.time_explosion
        # velocity coordinates in km/s (reference converts r/time * 1e-5)
        return r * 1e-5 / t_exp, mu, ty

    def get_coordinates_with_theta_init(self, r, mu, types, theta0=0.0):
        """2-D coordinates for one packet (reference rpacket_plot.py:450)."""
        theta = np.empty(len(r))
        if len(r) == 0:
            return theta, theta, types
        theta[0] = theta0
        for i in range(1, len(r)):
            acos_mu = np.arccos(np.clip(mu[i - 1], -1.0, 1.0))
            sin_term = np.clip(r[i - 1] * np.sin(acos_mu) / r[i], -1.0, 1.0)
            new_theta = theta[i - 1] + acos_mu
            if r[i] < r[i - 1]:
                new_theta = new_theta - np.pi + np.arcsin(sin_term)
            else:
                new_theta += np.arcsin(-sin_term)
            theta[i] = new_theta
        return r * np.cos(theta), r * np.sin(theta), types

    def get_coordinates_multiple_packets(self):
        """Coordinates for all plotted packets; launch angles uniform."""
        thetas = np.linspace(0, 2 * np.pi, self.no_of_packets + 1)
        xs, ys, tys = [], [], []
        for p in range(self.no_of_packets):
            r, mu, ty = self._packet_steps(p)
            x, y, t = self.get_coordinates_with_theta_init(
                r, mu, ty, thetas[p]
            )
            xs.append(x)
            ys.append(y)
            tys.append(t)
        return xs, ys, tys

    @staticmethod
    def get_equal_array_size(xs, ys, tys):
        """Pad all trajectories to the longest length (for frame sync)."""
        m = max(len(x) for x in xs) if xs else 0
        for i in range(len(xs)):
            pad = m - len(xs[i])
            if pad > 0:
                xs[i] = np.append(xs[i], np.full(pad, xs[i][-1]))
                ys[i] = np.append(ys[i], np.full(pad, ys[i][-1]))
                tys[i] = np.append(tys[i], np.full(pad, tys[i][-1]))
        return xs, ys, tys, m

    # ------------------------------------------------------------------
    def _shell_velocities(self):
        geo = self.sim.state.geometry
        t_exp = self.sim.state.time_explosion
        v = np.concatenate([[geo.r_inner[0]], geo.r_outer]) * 1e-5 / t_exp
        return v

    def generate_plot(self, theme: str = "light"):
        """Animated plotly figure (play/pause + step slider)."""
        import plotly.graph_objects as go

        th = _THEMES[theme]
        xs, ys, tys = self.get_coordinates_multiple_packets()
        xs, ys, tys, m = self.get_equal_array_size(xs, ys, tys)
        shells_v = self._shell_velocities()
        vmax = shells_v[-1] * 1.05

        fig = go.Figure()
        # photosphere + shells
        for k, v in enumerate(shells_v):
            fig.add_shape(
                type="circle", xref="x", yref="y",
                x0=-v, y0=-v, x1=v, y1=v,
                line=dict(
                    color=th["shells_line_color"],
                    width=1.5 if k == 0 else 0.5,
                ),
                fillcolor=(
                    th["photosphere_fillcolor"] if k == 0 else None
                ),
                opacity=1.0 if k == 0 else 0.6,
            )
        # full trajectories (final state), one trace per packet + markers
        for p in range(len(xs)):
            fig.add_trace(
                go.Scatter(
                    x=xs[p], y=ys[p], mode="lines",
                    line=dict(color=th["packet_line_color"], width=1.2),
                    name=f"packet {p}", showlegend=False,
                )
            )
            codes = np.asarray(tys[p], int)
            colors = [
                _INTERACTION_PROPS.get(c, _INTERACTION_PROPS[0])["color"]
                for c in codes
            ]
            texts = [
                _INTERACTION_PROPS.get(c, _INTERACTION_PROPS[0])["text"]
                for c in codes
            ]
            fig.add_trace(
                go.Scatter(
                    x=xs[p], y=ys[p], mode="markers", showlegend=False,
                    marker=dict(color=colors, size=5, opacity=0.8),
                    text=texts, hovertemplate="%{text}<br>vx=%{x:.0f} km/s"
                    "<br>vy=%{y:.0f} km/s<extra></extra>",
                )
            )
        # legend proxies per interaction type
        for code, props in _INTERACTION_PROPS.items():
            if code == 3:
                continue  # boundary markers cluttered; match reference set
            fig.add_trace(
                go.Scatter(
                    x=[None], y=[None], mode="markers",
                    marker=dict(color=props["color"], size=7),
                    name=props["text"], showlegend=True,
                )
            )

        # animation frames: trajectories grow step by step
        frames = [
            go.Frame(
                data=[
                    trace
                    for p in range(len(xs))
                    for trace in (
                        go.Scatter(x=xs[p][: s + 1], y=ys[p][: s + 1],
                                   mode="lines"),
                        go.Scatter(x=xs[p][: s + 1], y=ys[p][: s + 1],
                                   mode="markers"),
                    )
                ],
                name=str(s),
            )
            for s in range(m)
        ]
        fig.frames = frames

        slider_steps = [
            {
                "args": [[str(s)], {"frame": {"duration": 0, "redraw": False},
                                     "mode": "immediate"}],
                "label": str(s),
                "method": "animate",
            }
            for s in range(m)
        ]
        fig.update_layout(
            width=700, height=700,
            plot_bgcolor=th["plot_bgcolor"],
            paper_bgcolor=th["paper_bgcolor"],
            font=dict(color=th["font_color"]),
            title="R-packet trajectories",
            xaxis=dict(title="velocity [km/s]", range=[-vmax, vmax],
                       gridcolor=th["gridcolor"]),
            yaxis=dict(title="velocity [km/s]", range=[-vmax, vmax],
                       scaleanchor="x", gridcolor=th["gridcolor"]),
            updatemenus=[
                {
                    "type": "buttons",
                    "buttons": [
                        {
                            "label": "Play",
                            "method": "animate",
                            "args": [None, {
                                "frame": {"duration": 500, "redraw": False},
                                "fromcurrent": True,
                                "transition": {"duration": 300,
                                               "easing": "quadratic-in-out"},
                            }],
                        },
                        {
                            "label": "Pause",
                            "method": "animate",
                            "args": [[None], {
                                "frame": {"duration": 0, "redraw": False},
                                "mode": "immediate",
                                "transition": {"duration": 0},
                            }],
                        },
                    ],
                }
            ],
            sliders=[{
                "active": 0,
                "steps": slider_steps,
                "currentvalue": {"prefix": "Step: "},
            }],
        )
        return fig

    # ------------------------------------------------------------------
    def generate_plot_mpl(self, save_path=None, theme: str = "light"):
        """Static matplotlib rendering of the same geometry."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        th = _THEMES[theme]
        xs, ys, tys = self.get_coordinates_multiple_packets()
        shells_v = self._shell_velocities()

        fig, ax = plt.subplots(figsize=(7, 7))
        for k, v in enumerate(shells_v):
            ax.add_patch(
                plt.Circle(
                    (0, 0), v, fill=(k == 0),
                    lw=1.5 if k == 0 else 0.4,
                    color=th["photosphere_fillcolor"] if k == 0
                    else th["shells_line_color"],
                )
            )
        for p in range(len(xs)):
            ax.plot(xs[p], ys[p], lw=0.8, color=th["packet_line_color"])
            codes = np.asarray(tys[p], int)
            for code, props in _INTERACTION_PROPS.items():
                sel = codes == code
                if sel.any() and code not in (0, 3):
                    ax.scatter(
                        np.asarray(xs[p])[sel], np.asarray(ys[p])[sel],
                        s=8, color=props["color"], zorder=3,
                        label=props["text"] if p == 0 else None,
                    )
        vmax = shells_v[-1] * 1.05
        ax.set_xlim(-vmax, vmax)
        ax.set_ylim(-vmax, vmax)
        ax.set_aspect("equal")
        ax.set_xlabel("velocity [km/s]")
        ax.set_ylabel("velocity [km/s]")
        ax.set_title("R-packet trajectories")
        handles, labels = ax.get_legend_handles_labels()
        if handles:
            ax.legend(loc="upper right", fontsize=8)
        if save_path:
            fig.savefig(save_path, dpi=120, bbox_inches="tight")
        return fig
