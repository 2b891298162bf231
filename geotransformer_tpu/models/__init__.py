from geotransformer_tpu.models.geotransformer import GeoTransformer, create_model
from geotransformer_tpu.models.backbone import KPConvFPN
from geotransformer_tpu.models.kpconv import (
    KPConv,
    ConvBlock,
    ResidualBlock,
    UnaryBlock,
    LastUnaryBlock,
    maxpool,
    nearest_upsample,
    knn_interpolate,
    global_avgpool,
)
from geotransformer_tpu.models.transformer import (
    GeometricTransformer,
    GeometricStructureEmbedding,
    RPEConditionalTransformer,
    TransformerEncoder,
    TransformerDecoder,
)
from geotransformer_tpu.models.transformer_variants import (
    VanillaConditionalTransformer,
    PEConditionalTransformer,
    LRPEConditionalTransformer,
    LearnablePositionalEmbedding,
)
from geotransformer_tpu.models.point_matching import point_matching
from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport
from geotransformer_tpu.models.procrustes import weighted_procrustes
from geotransformer_tpu.models.matching import (
    superpoint_matching,
    superpoint_target_sample,
    get_node_correspondences,
    candidates_to_dense_overlaps,
)
from geotransformer_tpu.models.lgr import (
    local_to_global_registration,
    compute_correspondence_matrix,
    procrustes_from_pair_weights,
)
