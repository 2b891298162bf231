r"""KPConv feature-pyramid backbone (stage-spec driven).

One module covers the reference's three per-experiment backbones
(3DMatch 4-stage: `experiments/geotransformer.3dmatch.../backbone.py:8-87`,
KITTI 5-stage: `...kitti.../backbone.py:7-130`,
ModelNet 3-stage decoding to stage 0: `...modelnet.../backbone.py:8-77`) —
the encoder/decoder pattern is fully regular in the number of stages, so it
is generated from ``num_stages`` / ``first_fine_stage``:

  encoder1  : ConvBlock(in, d) ; Residual(d, 2d)
  encoder i : Residual(2^{i-1} d, strided) ; Residual(-> 2^i d) ; Residual(=)
  decoder j : upsample + concat skip -> Unary(2^{j+1} d + 2^j d -> 2^j d)
              (last decoder emits `output_dim` without norm/relu)

Returns ``feats_list`` finest-first: index 0 = decoded fine features, -1 =
coarsest encoder features (matching the reference contract).
"""

import flax.linen as nn
import jax.numpy as jnp

from geotransformer_tpu.models.kpconv import (
    ConvBlock,
    ResidualBlock,
    UnaryBlock,
    LastUnaryBlock,
    nearest_upsample,
)


class KPConvFPN(nn.Module):
    input_dim: int
    output_dim: int
    init_dim: int
    kernel_size: int
    init_radius: float
    init_sigma: float
    group_norm: int
    num_stages: int = 4
    first_fine_stage: int = 1  # stage index the last decoder emits (0-based)
    use_pallas: bool = False  # fused KPConv kernels (inference on TPU)
    # true (pre-sublane-alignment) neighbor limits per stage; bounds the
    # strided shortcut maxpool so alignment sentinels don't 0-clamp full rows
    neighbor_limits: tuple = ()

    @nn.compact
    def __call__(self, feats, batch):
        """Run the pyramid.

        Args:
            feats: (N_0, input_dim) stacked stage-0 features.
            batch: PairBatch dict with per-stage 'points', 'masks',
                'neighbors', 'subsampling', 'upsampling' lists.

        Returns:
            feats_list, finest-first (fine decoded feats .. coarsest feats).
        """
        points = batch["points"]
        masks = batch.get("masks", [None] * self.num_stages)
        neighbors = batch["neighbors"]
        subsampling = batch["subsampling"]
        upsampling = batch["upsampling"]
        # host-built inverse tables (training batches): scatter-free backward
        nb_inv = batch.get("neighbors_inv", [None] * self.num_stages)
        sub_inv = batch.get("subsampling_inv", [None] * self.num_stages)
        # split tables (deep-column compaction): fewer gathered rows where
        # the calibrated neighbor limit far exceeds the typical valid count
        nb_split = batch.get("neighbors_split", [None] * self.num_stages)
        sub_split = batch.get("subsampling_split", [None] * self.num_stages)
        d = self.init_dim
        k = self.kernel_size

        stage_feats = []
        x = feats
        for i in range(self.num_stages):
            radius = self.init_radius * (2**i)
            sigma = self.init_sigma * (2**i)
            cdim = d * (2**i)
            if i == 0:
                # encoder1_1's input features are the network input — its
                # d_s_feats is dead code, so no inverse table is passed.
                # Path priority: precomputed edge stream (gather-free) >
                # union gather > split tables > plain edge gather.
                stream0 = batch.get("input_stream")
                if self.input_dim != 1:
                    stream0 = None
                union0 = None
                if stream0 is None and "union_rows0" in batch:
                    union0 = (batch["union_rows0"], batch["union_sel0"])
                x = ConvBlock(
                    self.input_dim, d, k, radius, sigma, self.group_norm,
                    use_pallas=self.use_pallas,
                    input_layer=self.input_dim == 1, name="encoder1_1",
                )(x, points[0], points[0], neighbors[0], masks[0],
                  union_tables=union0, stream=stream0,
                  split_tables=None if union0 is not None or stream0 is not None
                  else nb_split[0])
                x = ResidualBlock(
                    d, 2 * d, k, radius, sigma, self.group_norm,
                    use_pallas=self.use_pallas, name="encoder1_2",
                )(x, points[0], points[0], neighbors[0], masks[0], masks[0],
                  inverse_table=nb_inv[0], split_tables=nb_split[0])
            else:
                pool_cols = (
                    self.neighbor_limits[i - 1] if self.neighbor_limits else None
                )
                x = ResidualBlock(
                    cdim, cdim, k, radius / 2, sigma / 2, self.group_norm,
                    strided=True, use_pallas=self.use_pallas,
                    pool_cols=pool_cols,
                    name=f"encoder{i + 1}_1",
                )(x, points[i], points[i - 1], subsampling[i - 1], masks[i], masks[i - 1],
                  inverse_table=sub_inv[i - 1], split_tables=sub_split[i - 1])
                x = ResidualBlock(
                    cdim, 2 * cdim, k, radius, sigma, self.group_norm,
                    use_pallas=self.use_pallas, name=f"encoder{i + 1}_2",
                )(x, points[i], points[i], neighbors[i], masks[i], masks[i],
                  inverse_table=nb_inv[i], split_tables=nb_split[i])
                x = ResidualBlock(
                    2 * cdim, 2 * cdim, k, radius, sigma, self.group_norm,
                    use_pallas=self.use_pallas, name=f"encoder{i + 1}_3",
                )(x, points[i], points[i], neighbors[i], masks[i], masks[i],
                  inverse_table=nb_inv[i], split_tables=nb_split[i])
            stage_feats.append(x)  # stage i feats: (N_i, 2^{i+1} d)

        feats_list = [stage_feats[-1]]
        latent = stage_feats[-1]
        for j in range(self.num_stages - 2, self.first_fine_stage - 1, -1):
            latent = nearest_upsample(latent, upsampling[j])
            latent = jnp.concatenate([latent, stage_feats[j]], axis=1)
            in_dim = latent.shape[1]
            out_dim = d * (2 ** (j + 1))
            if j == self.first_fine_stage:
                latent = LastUnaryBlock(in_dim, self.output_dim, name=f"decoder{j + 1}")(latent)
            else:
                latent = UnaryBlock(in_dim, out_dim, self.group_norm, name=f"decoder{j + 1}")(
                    latent, masks[j]
                )
            feats_list.append(latent)

        feats_list.reverse()
        return feats_list
