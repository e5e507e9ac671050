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


def make_mesh(n_devices=None, axis="batch"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_program(program, mesh, axis="batch"):
    """Wrap a WitnessProgram into a pjit'ed fn with the batch dim sharded.

    Input layout (n_inputs, L, batch): batch is dim 2 (minor/lane axis).
    Output layout (n_witness, L, batch): batch is dim 2.
    """
    in_sharding = NamedSharding(mesh, P(None, None, axis))
    out_sharding = NamedSharding(mesh, P(None, None, axis))
    return jax.jit(
        program.jittable(),
        in_shardings=in_sharding,
        out_shardings=out_sharding,
    )


def shard_checker(check_fn, mesh, axis="batch"):
    """R1CS checker sharded on batch (z: (n_wires, L, batch)); the final
    all-ok reduction is a jnp.all over the sharded residual (XLA inserts
    the psum)."""
    in_sharding = NamedSharding(mesh, P(None, None, axis))
    return jax.jit(check_fn, in_shardings=(in_sharding,),
                   out_shardings=NamedSharding(mesh, P()))
