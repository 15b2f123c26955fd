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

Round 3 makes this the PRODUCTION path (TransportSolver picks it whenever
the mesh has more than one device) with full feature parity with
kernel.run_transport:

- **watchdog chunking**: pools larger than ``chunk_size`` run as a host-side
  loop of sharded chunk programs with global pid offsets (each chunk bounds
  per-launch wall time below the TPU worker watchdog; see
  kernel.run_transport's root-cause note) — bitwise identical to one pass;
- **on-device tail repack**: the wide per-device loop exits once at most
  ``tail_batch`` lanes survive; survivors are compacted to the front with a
  stable argsort ON DEVICE (no host round-trip, unlike the single-device
  path) and finished in a narrow loop;
- **per-packet weights** (``pool_w``) for weighted/relativistic sources;
- **estimator-reduce overlap**: each chunk program also psums the PREVIOUS
  chunk's estimator partials; XLA schedules that all-reduce concurrently
  with the new chunk's transport while_loop (async collective over ICI),
  so the big (L+1)*S*2 line reduction hides behind compute (SURVEY.md §7
  step 6).
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


def _est_tuple(carry, static):
    fields = _SUM_FIELDS + (_CONT_SUM_FIELDS if static.enable_continuum
                            else ())
    return tuple(getattr(carry, f) for f in fields)


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
                     "max_steps", "tail_batch", "mesh", "have_pending",
                     "have_w"),
)
def _sharded_chunk(
    tables,
    static,
    pool_mu,
    pool_nu_cmf,
    base_key,
    chunk_offset,  # i32 scalar: global pid of this chunk's first packet
    pending,  # tuple of UNREDUCED per-device estimator partials (or ())
    n_local: int,
    n_local_total: int,
    batch_local: int,
    mesh: Mesh,
    max_steps: int,
    tail_batch: int,
    have_pending: bool,
    have_w: bool,
    pool_w=None,
):
    """One sharded chunk + overlapped psum of the previous chunk's partials.

    Returns (carry with UNREDUCED estimators, reduced_pending or ()).
    """

    def local_run(tables_l, key_l, off, mu_l, nu_l, w_l, pending_l):
        # global packet id of this device's chunk start: the device owns
        # pool segment [d*n_local_total, (d+1)*n_local_total) and the chunk
        # starts `off` packets into it
        offset = off + lax.axis_index("packets") * n_local_total
        # the previous chunk's estimator all-reduce — independent of the
        # transport loop below, so XLA can run it as an async collective
        # concurrently with the while_loop
        if have_pending:
            reduced = tuple(lax.psum(x, "packets") for x in pending_l)
        else:
            reduced = ()
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
            tail_threshold=tail_batch if 0 < tail_batch < batch_local else 0,
            pool_w=w_l if have_w else None,
        )
        if 0 < tail_batch < batch_local:
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
            )
        n_steps = lax.pmax(carry.n_steps, "packets")
        vp_count = lax.psum(carry.vp_count, "packets")
        return (
            carry._replace(n_steps=n_steps, vp_count=vp_count),
            reduced,
        )

    spec_repl = jax.tree.map(lambda _: P(), tables)
    pending_spec = tuple(P() for _ in pending)
    carry_specs = _carry_specs(static)
    f = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(spec_repl, P(), P(), P("packets"), P("packets"),
                  P("packets") if have_w else P(), pending_spec),
        out_specs=(carry_specs, pending_spec),
    )
    w_arg = pool_w if have_w else jnp.zeros_like(pool_mu)[:1]
    return f(tables, base_key, chunk_offset, pool_mu, pool_nu_cmf, w_arg,
             pending)


@partial(jax.jit, static_argnames=("mesh",))
def _final_psum(pending, mesh: Mesh):
    def red(*xs):
        return tuple(lax.psum(x, "packets") for x in xs)

    specs = tuple(P() for _ in pending)
    return shard_map(
        lambda *xs: red(*xs), mesh=mesh, in_specs=specs, out_specs=specs
    )(*pending)


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
):
    """Run transport with the packet pool sharded over ``mesh``.

    Full-parity production entry point (chunking, tail repack, pool_w,
    overlapped estimator reduction).  Returns a TransportCarry whose output
    arrays are sharded over packets and whose estimator arrays are fully
    reduced (replicated) — bitwise identical to kernel.run_transport for
    any device count (per-packet counter RNG + deterministic reductions).
    """
    n_dev = mesh.devices.size
    if n_packets % n_dev != 0:
        raise ValueError(
            f"n_packets={n_packets} not divisible by {n_dev} devices"
        )
    have_w = pool_w is not None
    # per-device chunking: global chunk covers n_dev * chunk_local packets
    chunk_local = max(chunk_size // n_dev, 1)
    n_local_total = n_packets // n_dev

    carries = []
    pending = ()
    reduced_parts = []
    for start_local in range(0, n_local_total, chunk_local):
        n_local = min(chunk_local, n_local_total - start_local)
        batch_local = min(batch_size, n_local)
        # global slice: device d's packets for this chunk live at
        # [d*n_local_total + start_local, ... + n_local) — reshape the pool
        # so each device gets its contiguous sub-slice
        sl = _chunk_slice(n_dev, n_local_total, start_local, n_local)
        tb = tail_batch if n_local >= 4 * max(tail_batch, 1) else 0
        carry, reduced = _sharded_chunk(
            tables,
            static,
            pool_mu[sl],
            pool_nu_cmf[sl],
            base_key,
            jnp.asarray(start_local, jnp.int32),
            pending,
            n_local=n_local,
            n_local_total=n_local_total,
            batch_local=batch_local,
            mesh=mesh,
            max_steps=max_steps,
            tail_batch=tb,
            have_pending=bool(pending),
            have_w=have_w,
            pool_w=pool_w[sl] if have_w else None,
        )
        if reduced:
            reduced_parts.append(reduced)
        pending = _est_tuple(carry, static)
        carries.append(carry)
    reduced_parts.append(_final_psum(pending, mesh))

    # sum the reduced estimator partials across chunks (host-side jnp adds)
    fields = _est_fields(static)
    totals = list(reduced_parts[0])
    for part in reduced_parts[1:]:
        totals = [a + b for a, b in zip(totals, part)]

    first = carries[0]

    def cat(field):
        if len(carries) == 1:
            return getattr(first, field)
        return _interleave_chunks(
            [getattr(c, field) for c in carries], n_dev
        )

    def tot(field):
        out = getattr(first, field)
        for c in carries[1:]:
            out = out + getattr(c, field)
        return out

    merged = first._replace(
        out_packed=cat("out_packed"),
        n_steps=tot("n_steps"),
        vp_count=tot("vp_count"),
        **dict(zip(fields, totals)),
    )
    if static.vpacket_capacity > 0:
        merged = merged._replace(vp_packed=cat("vp_packed"))
    if static.track_last_interaction:
        merged = merged._replace(li_packed=cat("li_packed"))
    if static.track_rpacket_length > 0:
        merged = merged._replace(tr_packed=cat("tr_packed"))
    return merged


def _chunk_slice(n_dev, n_local_total, start_local, n_local):
    """Global pool indices of chunk [start_local, start_local+n_local) on
    every device, as one fancy-index array (device-major order)."""
    import numpy as np

    base = np.arange(n_dev)[:, None] * n_local_total
    idx = base + (start_local + np.arange(n_local))[None, :]
    return jnp.asarray(idx.reshape(-1))


def _interleave_chunks(parts, n_dev):
    """Reassemble per-chunk sharded outputs into global packet order.

    Each part is (n_dev * k_i * w) flat (device-major); the global layout is
    device-major over the FULL pool, so concatenate per-device segments.
    """
    segs = []
    for d in range(n_dev):
        for p in parts:
            k = p.shape[0] // n_dev
            segs.append(p[d * k : (d + 1) * k])
    out = jnp.concatenate(
        [segs[d * len(parts) + c]
         for d in range(n_dev) for c in range(len(parts))]
    )
    return out
