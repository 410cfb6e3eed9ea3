"""Device-mesh construction and sharding helpers.

This layer is absent in the reference (single-process, single-device — see
SURVEY.md §2.5) and is a first-class component here:

- one global mesh with axes ``("dp", "tp")``:
  * ``dp`` — data parallel; the environment-batch axis is sharded over it,
    gradients are psum-reduced over it by XLA (via sharding propagation).
  * ``tp`` — tensor parallel; Dense kernels can be partitioned over it for
    large models (see ``rlx_tpu.parallel.partition``).
- single chip == degenerate (1, 1) mesh, so all algorithms run the same code
  path from 1 chip to a pod.
- multi-host: ``jax.distributed.initialize`` handled by ``initialize_distributed``.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(dp=None, tp=1, devices=None):
    """Build the global ("dp", "tp") mesh.  ``dp=None`` -> use all devices."""
    if devices is None:
        devices = jax.devices()
    if dp is None:
        dp = len(devices) // tp
    if dp * tp > len(devices):
        raise ValueError(f"mesh ({dp=}, {tp=}) needs {dp * tp} devices, have {len(devices)}")
    device_array = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(device_array, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh):
    """Sharding for arrays with a leading env/batch axis."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh):
    """Constrain every batch-leading leaf to the dp mesh axis.

    Leaves whose leading dim doesn't divide by the dp axis size (PRNG keys,
    scalars, small constants) are left unconstrained.
    """
    s = batch_sharding(mesh)
    dp = mesh.shape[DP_AXIS]

    def constrain(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] >= dp and x.shape[0] % dp == 0:
            return jax.lax.with_sharding_constraint(x, s)
        return x

    return jax.tree.map(constrain, tree)


def replicate(tree, mesh):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, s), tree)


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host entry: call before any jax computation on TPU pods.

    No-op when running single-process (the common dev path).
    """
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
