r"""geotransformer_tpu: a TPU-native point-cloud registration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GeoTransformer
(CVPR 2022): coarse-to-fine, RANSAC-free pairwise point-cloud registration
with a KPConv feature pyramid, geometric self-attention over superpoints,
Sinkhorn optimal-transport fine matching, and local-to-global weighted-
Procrustes pose estimation.

Design stance (TPU-first, not a port):
  * Every on-device shape is static: point pyramids are padded to calibrated
    capacities with boolean masks; dynamic-shape idioms of the reference
    (``torch.nonzero``, python chunk lists, data-dependent top-k) become
    masked top-k and weighted reductions.
  * The irregular preprocessing (voxel grid subsampling, radius neighbor
    search) runs host-side (numpy / C++), producing fixed-capacity index
    tables; the differentiable model is one ``jit``-compiled function.
  * Multi-device scaling uses ``jax.sharding.Mesh`` + ``shard_map`` data
    parallelism over registration pairs with ``psum`` gradient reduction.
"""

__version__ = "0.1.0"
