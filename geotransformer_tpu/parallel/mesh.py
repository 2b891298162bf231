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
    """1-D data-parallel mesh over the available devices.

    In a multi-process (multi-host) launch ``jax.devices()`` is the global
    device list; the mesh must then cover ALL devices so every process owns
    addressable shards (the reference's DistributedSampler+DDP equivalent,
    `/root/reference/geotransformer/engine/base_trainer.py:66-72`).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available; a smaller mesh would "
                "silently mis-shard the per-pair batch (one pair per device)"
            )
        if jax.process_count() > 1 and num_devices != len(devices):
            raise ValueError(
                f"multi-host launch: the mesh must cover all "
                f"{len(devices)} global devices (got num_devices="
                f"{num_devices}); set batch_size = local device count"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh):
    """Sharding for leading-axis-stacked per-pair batches."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh, stacked_batch):
    """Place a leading-axis-stacked batch pytree onto the mesh.

    Single-process: a plain sharded device_put. Multi-process: each process
    holds only its local pairs, so the global array is assembled from
    process-local shards (``jax.make_array_from_process_local_data``) — the
    leading axis of `stacked_batch` is the LOCAL batch and the global
    leading axis is ``local * process_count``.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            stacked_batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked_batch)
