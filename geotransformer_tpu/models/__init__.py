from geotransformer_tpu.models.geotransformer import (
    GeoTransformer,
    create_model,
    precompute_gt_targets,
)
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
from geotransformer_tpu.models.corr_utils import (
    extract_correspondences_from_scores,
    extract_correspondences_from_scores_threshold,
    extract_correspondences_from_scores_topk,
    extract_correspondences_from_feats,
    dense_correspondences_to_node_correspondences,
    node_correspondences_to_dense_correspondences,
    get_node_overlap_ratios,
    get_node_occlusion_ratios,
)
