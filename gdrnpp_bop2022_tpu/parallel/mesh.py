"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's entire distributed matrix
(DDP / horovod / lightning strategies + NCCL collectives — reference:
core/utils/my_comm.py, main_gdrn.py:197-225). One ``jax.sharding.Mesh``
with a data axis; batch arrays are sharded over it, params are replicated,
and XLA inserts the gradient psum automatically under jit. On multi-host
pods, ``jax.distributed.initialize`` + the same code applies unchanged.

For these ≤100M-param CNNs data parallelism is the whole story (the
reference has no TP/PP — SURVEY.md §2.6); the mesh is still built n-D-ready
so fsdp-style param sharding can be layered on via NamedSharding specs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; -1 in mesh_shape absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(batch_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_axis: str = "data"):
    """Device-put a pytree of host arrays with dim-0 sharded over the mesh."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
