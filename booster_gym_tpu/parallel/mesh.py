"""Device mesh + sharding for env-batch data parallelism.

The reference has no distribution at all (SURVEY.md §2.4: one GPU, full
batch); this module is the new TPU-first design: a 1-D ("dp",) mesh, env
batch sharded over it, parameters/optimizer replicated.  We annotate inputs
with NamedSharding and let XLA insert the collectives (gradient psum rides
ICI) rather than hand-writing any communication — the scaling-book recipe.

Multi-host: jax.distributed.initialize() before building the mesh makes the
same code span DCN; jax.make_mesh orders devices so dp neighbors stay on
ICI within a host.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices=None, axis_name="dp"):
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def env_sharding(mesh, axis_name="dp"):
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh, tree, batch_size, axis_name="dp"):
    """Place a pytree on the mesh: leaves whose leading dim equals the env
    batch are sharded over dp; everything else (params, scalars, the shared
    curriculum grid, PRNG keys) is replicated."""
    shard = env_sharding(mesh, axis_name)
    repl = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)


_DIST_ENV_SIGNALS = (
    # deliberately only the explicit JAX coordinator variables: platform
    # plumbing like TPU_WORKER_HOSTNAMES can be set on single-host machines
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host entry: call before any jax computation on pod slices.

    Returns True when a multi-process runtime was initialized.  A genuinely
    single-host run (no coordinator configured anywhere) is a quiet no-op,
    but a *misconfigured* multi-host run fails loudly — silently degrading
    to single-host training is the failure mode this guards against.
    """
    import os

    explicit = coordinator_address is not None or num_processes is not None
    env_signal = any(os.environ.get(k) for k in _DIST_ENV_SIGNALS)
    if not (explicit or env_signal):
        return False
    # any failure from here (unreachable coordinator, wrong process count,
    # double init) propagates: the caller asked for multi-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True
