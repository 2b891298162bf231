r"""Device mesh helpers.

The reference scales with one process per GPU + NCCL DDP
(`/root/reference/geotransformer/engine/base_trainer.py:66-72`). The TPU
equivalent is a single program over a ``jax.sharding.Mesh``: registration
pairs are sharded over the ``data`` axis and gradients are reduced with
``psum`` over ICI. Model/optimizer state is replicated (the model is ~10M
params — far below the threshold where parameter sharding pays).
"""

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec, NamedSharding

DATA_AXIS = "data"


def make_mesh(num_devices=None, devices=None):
    """1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available; a smaller mesh would "
                "silently mis-shard the per-pair batch (one pair per device)"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh):
    """Sharding for leading-axis-stacked per-pair batches."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh, stacked_batch):
    """Place a leading-axis-stacked batch pytree onto the mesh."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked_batch)
