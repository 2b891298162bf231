from geotransformer_tpu.ops.pairwise_distance import pairwise_distance
from geotransformer_tpu.ops.gather import gather_with_shadow, index_select, masked_topk
from geotransformer_tpu.ops.partition import (
    point_to_node_partition,
    knn_partition,
    get_point_to_node_indices,
    ball_query_partition,
)
from geotransformer_tpu.ops.se3 import (
    apply_transform,
    apply_rotation,
    get_transform_from_rotation_translation,
    get_rotation_translation_from_transform,
    inverse_transform,
    skew_symmetric_matrix,
    rodrigues_rotation_matrix,
    rodrigues_alignment_matrix,
)
from geotransformer_tpu.ops.vector_angle import vector_angle, rad2deg, deg2rad
from geotransformer_tpu.ops.embedding import sinusoidal_embedding
