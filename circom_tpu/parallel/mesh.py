"""Multi-chip execution: shard the witness batch over a device mesh.

The reference's parallelism is threads on one host
(calcwit.hpp:33-38, store_bucket.rs:660-780).  The TPU-native replacement
(SURVEY.md §2.12, §7.1 step 8): witnesses in a batch are independent, so
the batch axis shards across every chip of a mesh with ZERO collectives on
the witness path; only the R1CS checker reduces across shards (psum) and
the host gathers results.

Works identically on a real slice and on the virtual CPU mesh used in
tests (xla_force_host_platform_device_count).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _without_pl_gather(fused, fn):
    """Run `fn` with the fused program's Pallas-gather flag off, then
    restore it.  The flag is consulted at trace time, so scoping the
    override to the call keeps later unsharded runs of the same
    program on the fast gather path (advisor r4 finding)."""
    def wrapped(*args):
        saved = fused.pl_gather
        fused.pl_gather = False
        try:
            return fn(*args)
        finally:
            fused.pl_gather = saved
    return wrapped


def make_mesh(n_devices=None, axis="batch"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_program(program, mesh, axis="batch", use_fused=None):
    """Wrap a WitnessProgram into a pjit'ed fn with the batch dim sharded.

    Input layout (n_inputs, L, batch): batch is dim 2 (minor/lane axis).
    Output layout (n_witness, L, batch): batch is dim 2.

    The fused Pallas backends are custom calls XLA cannot auto-partition,
    so they run under shard_map: each device executes the whole kernel on
    its local batch shard (still zero collectives — witnesses are
    independent).  The per-op/scan paths are plain elementwise XLA and
    partition automatically under jit.
    """
    from ..ops.jfield import on_tpu

    spec = P(None, None, axis)
    in_sharding = NamedSharding(mesh, spec)
    out_sharding = NamedSharding(mesh, spec)
    if use_fused is None:
        use_fused = program.fused is not None and on_tpu()
    if use_fused:
        from jax.experimental.shard_map import shard_map

        # witness gather falls back to the XLA path inside shard_map
        # regions (manual-DMA Pallas kernels fail remote compile there);
        # pl_gather is read at trace time, so disable it only for the
        # duration of this body's trace — NOT permanently on the
        # shared program object (a later unsharded run keeps the fast
        # Pallas gather path)
        body = shard_map(_without_pl_gather(program.fused,
                                            program.fused._run),
                         mesh=mesh,
                         in_specs=(spec,), out_specs=spec,
                         check_rep=False)
        return jax.jit(body, in_shardings=in_sharding,
                       out_shardings=out_sharding)
    return jax.jit(
        program.jittable(),
        in_shardings=in_sharding,
        out_shardings=out_sharding,
    )


def shard_program_mixed(program, mesh, axis="batch"):
    """shard_map the fused interpreter's MIXED-witness path over the
    batch axis: (narrow int32 (n_nw, B), wide uint32 (n_wd, L, B)),
    batch sharded, zero collectives.  The production path for SHA-class
    (bit-heavy) circuits at scale — the full-limb witness would not
    even fit one device's HBM at large batch."""
    from jax.experimental.shard_map import shard_map

    in_spec = P(None, None, axis)
    out_specs = (P(None, axis), P(None, None, axis))
    body = shard_map(_without_pl_gather(program.fused,
                                        program.fused._run_mixed),
                     mesh=mesh,
                     in_specs=(in_spec,), out_specs=out_specs,
                     check_rep=False)
    return jax.jit(
        body,
        in_shardings=NamedSharding(mesh, in_spec),
        out_shardings=tuple(NamedSharding(mesh, s) for s in out_specs))


def shard_checker(check_fn, mesh, axis="batch"):
    """R1CS checker sharded on batch (z: (n_wires, L, batch)); the final
    all-ok reduction is a jnp.all over the sharded residual (XLA inserts
    the psum)."""
    in_sharding = NamedSharding(mesh, P(None, None, axis))
    return jax.jit(check_fn, in_shardings=(in_sharding,),
                   out_shardings=NamedSharding(mesh, P()))
