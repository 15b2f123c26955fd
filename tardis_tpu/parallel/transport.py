"""Multi-device packet-parallel transport via shard_map (production path).

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

This is the PRODUCTION path (TransportSolver picks it whenever the mesh has
more than one device) with full feature parity with kernel.run_transport:

- **watchdog chunking with lane continuity**: pools larger than
  ``chunk_size`` run as a host loop of sharded chunk programs threading ONE
  per-device carry; each non-final chunk's per-device loop exits the moment
  its pool slice is exhausted (transport_loop drain=False) with all
  in-flight lanes alive, so chunk boundaries cost zero occupancy and the
  event schedule is nearly identical to one giant pool (each chunk still bounds
  per-launch wall time below the TPU worker watchdog; see
  kernel.run_transport's root-cause note);
- **on-device tail repack**: the final chunk's wide loop exits once at most
  ``tail_batch`` lanes survive; survivors are compacted to the front with a
  stable argsort ON DEVICE (no host round-trip, unlike the single-device
  path) and finished in a narrow loop;
- **per-packet weights** (``pool_w``) for weighted/relativistic sources;
- estimators accumulate per-device across all chunks and are psum'd ONCE
  after the final chunk — measured at ~0.1% of chunk compute at 8 devices
  (SCALING_r03.json), so no further overlap is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from tardis_tpu.transport.kernel import (
    TransportCarry,
    init_carry,
    transport_loop,
)

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


# estimator fields reduced across devices (psum)
_SUM_FIELDS = (
    "est_j", "est_nubar", "line_diff", "line_lo", "est_j_lo",
    "est_nubar_lo", "n_events",
)
_CONT_SUM_FIELDS = ("cont_moments", "est_ff_heat", "cont_lo", "ff_lo")


def _est_fields(static):
    return _SUM_FIELDS + (_CONT_SUM_FIELDS if static.enable_continuum
                          else ())


def _carry_specs(static):
    return TransportCarry(
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


def _device_repack(carry, tail_batch):
    """Compact surviving lanes to the front (stable) — on-device analogue of
    kernel.run_transport's host-side tail repack."""
    order = jnp.argsort(~carry.alive, stable=True)
    sel = order[:tail_batch]

    def take(x):
        return x[sel]

    return carry._replace(
        r=take(carry.r),
        mu=take(carry.mu),
        nu=take(carry.nu),
        energy=take(carry.energy),
        shell=take(carry.shell),
        next_line=take(carry.next_line),
        pkt_id=take(carry.pkt_id),
        event_idx=take(carry.event_idx),
        alive=take(carry.alive),
    )


@partial(
    jax.jit,
    static_argnames=("static", "n_local", "n_local_total", "batch_local",
                     "max_steps", "tail_batch", "mesh", "have_carry",
                     "have_w", "drain"),
    donate_argnames=("carry0",),
)
def _sharded_chunk(
    tables,
    static,
    pool_mu,
    pool_nu_cmf,
    base_key,
    chunk_offset,  # i32 scalar: this chunk's start within each device slice
    carry0,  # per-device carry from the previous chunk (or 0 on first call)
    n_local: int,
    n_local_total: int,
    batch_local: int,
    mesh: Mesh,
    max_steps: int,
    tail_batch: int,
    have_carry: bool,
    have_w: bool,
    drain: bool,
    pool_w=None,
):
    """One sharded chunk with lane continuity.

    Returns a carry whose estimator fields are per-device UNREDUCED
    partials; reduce once with _final_psum after the last chunk.
    """

    def local_run(tables_l, key_l, off, mu_l, nu_l, w_l, carry_l):
        # global packet id of this device's chunk start: the device owns
        # pool segment [d*n_local_total, (d+1)*n_local_total) and the chunk
        # starts `off` packets into it
        dev_base = lax.axis_index("packets") * n_local_total
        offset = off + dev_base
        if have_carry:
            c0 = carry_l._replace(
                next_unborn=jnp.zeros((), jnp.int32)
            )
        else:
            c0 = init_carry(static, batch_local, n_local_total)
        tb = tail_batch if (drain and 0 < tail_batch < batch_local) else 0
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
            carry0=c0,
            tail_threshold=tb,
            pool_w=w_l if have_w else None,
            n_out=n_local_total,
            out_offset=dev_base,
            drain=drain,
        )
        if tb:
            tail0 = _device_repack(carry, tail_batch)
            carry = transport_loop(
                tables_l,
                static,
                mu_l,
                nu_l,
                key_l,
                n_packets=n_local,
                batch_size=tail_batch,
                max_steps=max_steps,
                pid_offset=offset,
                carry0=tail0,
                pool_w=w_l if have_w else None,
                n_out=n_local_total,
                out_offset=dev_base,
            )
        return carry

    spec_repl = jax.tree.map(lambda _: P(), tables)
    carry_specs = _carry_specs(static)
    f = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(spec_repl, P(), P(), P("packets"), P("packets"),
                  P("packets") if have_w else P(), carry_specs),
        out_specs=carry_specs,
    )
    w_arg = pool_w if have_w else jnp.zeros_like(pool_mu)[:1]
    return f(tables, base_key, chunk_offset, pool_mu, pool_nu_cmf, w_arg,
             carry0)


@partial(jax.jit, static_argnames=("mesh", "static"))
def _final_reduce(carry, mesh: Mesh, static):
    """Psum the per-device estimator partials; pmax steps, psum vp_count."""
    fields = _est_fields(static)

    def red(*xs):
        n_steps, vp_count = xs[-2], xs[-1]
        return tuple(lax.psum(x, "packets") for x in xs[:-2]) + (
            lax.pmax(n_steps, "packets"),
            lax.psum(vp_count, "packets"),
        )

    vals = tuple(getattr(carry, f) for f in fields) + (
        carry.n_steps, carry.vp_count,
    )
    specs = tuple(P() for _ in vals)
    out = shard_map(red, mesh=mesh, in_specs=specs, out_specs=specs)(*vals)
    return carry._replace(
        **dict(zip(fields, out[: len(fields)])),
        n_steps=out[-2],
        vp_count=out[-1],
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
    tail_batch: int = 0,
    chunk_size: int = 2097152,
    pool_w=None,
    progress=None,
):
    """Run transport with the packet pool sharded over ``mesh``.

    ``progress(done, total)`` is called after each chunk program (see
    kernel.run_transport).

    Full-parity production entry point (lane-continuous chunking, tail
    repack, pool_w).  Returns a TransportCarry whose output arrays are
    sharded over packets and whose estimator arrays are fully reduced
    (replicated) — per-packet outputs bitwise identical to
    kernel.run_transport for any device count (per-packet counter RNG).
    """
    n_dev = mesh.devices.size
    if n_packets % n_dev != 0:
        raise ValueError(
            f"n_packets={n_packets} not divisible by {n_dev} devices"
        )
    have_w = pool_w is not None
    if progress is not None:
        chunk_size = min(chunk_size, 262144)
        progress(0, n_packets)
    # per-device chunking: global chunk covers n_dev * chunk_local packets
    chunk_local = max(chunk_size // n_dev, 1)
    n_local_total = n_packets // n_dev
    batch_local = min(batch_size, n_local_total)

    carry = _init_like(static, batch_local, n_local_total, mesh)
    have_carry = False
    for start_local in range(0, n_local_total, chunk_local):
        n_local = min(chunk_local, n_local_total - start_local)
        last = start_local + n_local >= n_local_total
        # global slice: device d's packets for this chunk live at
        # [d*n_local_total + start_local, ... + n_local) — reshape the pool
        # so each device gets its contiguous sub-slice
        sl = _chunk_slice(n_dev, n_local_total, start_local, n_local)
        carry = _sharded_chunk(
            tables,
            static,
            pool_mu[sl],
            pool_nu_cmf[sl],
            base_key,
            jnp.asarray(start_local, jnp.int32),
            carry,
            n_local=n_local,
            n_local_total=n_local_total,
            batch_local=batch_local,
            mesh=mesh,
            max_steps=max_steps,
            tail_batch=tail_batch,
            have_carry=have_carry,
            have_w=have_w,
            drain=last,
            pool_w=pool_w[sl] if have_w else None,
        )
        have_carry = True
        if progress is not None:
            jax.block_until_ready(carry.n_steps)
            progress(
                min((start_local + n_local) * n_dev, n_packets), n_packets
            )
    return _final_reduce(carry, mesh, static)


def _init_like(static, batch_local, n_local_total, mesh):
    """Globally-shaped zero carry matching _sharded_chunk's out layout.

    Lane/per-packet fields are n_dev x the per-device shape (sharded over
    'packets'); scalar/estimator fields keep the per-device shape.  Only
    consumed as the donated dummy carry0 of the first chunk.
    """
    n_dev = mesh.devices.size
    local = init_carry(static, batch_local, n_local_total)
    specs = _carry_specs(static)
    out = {}
    for f in TransportCarry._fields:
        x = getattr(local, f)
        spec = getattr(specs, f)
        if len(spec) > 0 and spec[0] == "packets":
            x = jnp.zeros((x.shape[0] * n_dev,) + x.shape[1:], x.dtype)
        out[f] = x
    return TransportCarry(**out)


def _chunk_slice(n_dev, n_local_total, start_local, n_local):
    """Global pool indices of chunk [start_local, start_local+n_local) on
    every device, as one fancy-index array (device-major order)."""
    import numpy as np

    base = np.arange(n_dev)[:, None] * n_local_total
    idx = base + (start_local + np.arange(n_local))[None, :]
    return jnp.asarray(idx.reshape(-1))
