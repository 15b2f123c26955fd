"""Multi-device packet-parallel transport via shard_map.

The TPU-native replacement for the reference's prange-over-OS-threads data
parallelism (/root/reference/tardis/transport/montecarlo/modes/
montecarlo_transport.py:315 and its per-thread estimator lists reduced with
.increment(), :305-359):

- the packet pool is sharded over a 1-D device mesh axis "packets";
- every device runs the same persistent-slot event loop on its shard,
  with GLOBAL packet ids feeding the counter-based RNG (so results are
  bit-identical to a single-device run);
- estimator accumulators are reduced with jax.lax.psum over ICI —
  the collective analogue of the reference's thread-local increment() merge;
- packet output arrays stay device-local (sharded) and are only gathered
  lazily on the host for spectra.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tardis_tpu.transport.kernel import TransportCarry, transport_loop

try:  # jax>=0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn


def shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: the transport carry starts as device-invariant zeros
    # and becomes device-varying through pid_offset; the varying-manual-axes
    # checker rejects that inside while_loop, so we opt out.
    return _shard_map_fn(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def packet_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis name 'packets'."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("packets",))


@partial(
    jax.jit,
    static_argnames=("static", "n_packets", "batch_size", "max_steps", "mesh"),
)
def run_transport_sharded(
    tables,
    static,
    pool_mu,
    pool_nu_cmf,
    base_key,
    n_packets: int,
    batch_size: int,
    mesh: Mesh,
    max_steps: int = 1 << 30,
):
    """Run transport with the packet pool sharded over `mesh`.

    Returns a TransportCarry whose output arrays are sharded over packets and
    whose estimator arrays are fully reduced (replicated).
    """
    n_dev = mesh.devices.size
    if n_packets % n_dev != 0:
        raise ValueError(
            f"n_packets={n_packets} not divisible by {n_dev} devices"
        )
    n_local = n_packets // n_dev
    batch_local = min(batch_size, n_local)

    def local_run(tables_l, key_l, mu_l, nu_l):
        offset = lax.axis_index("packets") * n_local
        carry = transport_loop(
            tables_l,
            static,
            mu_l,
            nu_l,
            key_l,
            n_packets=n_local,
            batch_size=batch_local,
            max_steps=max_steps,
            pid_offset=offset,
        )
        # estimator all-reduce over ICI (analogue of per-thread increment())
        est_j = lax.psum(carry.est_j, "packets")
        est_nubar = lax.psum(carry.est_nubar, "packets")
        line_diff = lax.psum(carry.line_diff, "packets")
        line_lo = lax.psum(carry.line_lo, "packets")
        est_j_lo = lax.psum(carry.est_j_lo, "packets")
        est_nubar_lo = lax.psum(carry.est_nubar_lo, "packets")
        n_steps = lax.pmax(carry.n_steps, "packets")
        n_events = lax.psum(carry.n_events, "packets")
        vp_count = lax.psum(carry.vp_count, "packets")
        reduced = carry._replace(
            est_j=est_j,
            est_nubar=est_nubar,
            line_diff=line_diff,
            line_lo=line_lo,
            est_j_lo=est_j_lo,
            est_nubar_lo=est_nubar_lo,
            vp_count=vp_count,
            n_steps=n_steps,
            n_events=n_events,
        )
        if static.enable_continuum:
            reduced = reduced._replace(
                cont_moments=lax.psum(carry.cont_moments, "packets"),
                est_ff_heat=lax.psum(carry.est_ff_heat, "packets"),
                cont_lo=lax.psum(carry.cont_lo, "packets"),
                ff_lo=lax.psum(carry.ff_lo, "packets"),
            )
        return reduced

    spec_repl = jax.tree.map(lambda _: P(), tables)
    carry_specs = TransportCarry(
        r=P("packets"),
        mu=P("packets"),
        nu=P("packets"),
        energy=P("packets"),
        shell=P("packets"),
        next_line=P("packets"),
        pkt_id=P("packets"),
        event_idx=P("packets"),
        alive=P("packets"),
        next_unborn=P(),
        est_j=P(),
        est_nubar=P(),
        line_diff=P(),
        out_packed=P("packets"),
        vp_packed=P("packets"),
        vp_count=P(),
        tr_packed=P("packets"),
        li_packed=P("packets"),
        cont_moments=P(),
        est_ff_heat=P(),
        n_steps=P(),
        n_events=P(),
        line_lo=P(),
        est_j_lo=P(),
        est_nubar_lo=P(),
        cont_lo=P(),
        ff_lo=P(),
    )
    f = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(spec_repl, P(), P("packets"), P("packets")),
        out_specs=carry_specs,
    )
    return f(tables, base_key, pool_mu, pool_nu_cmf)
