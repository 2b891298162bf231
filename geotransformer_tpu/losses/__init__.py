from geotransformer_tpu.losses.circle_loss import circle_loss, weighted_circle_loss
from geotransformer_tpu.losses.metrics import (
    relative_rotation_error,
    relative_translation_error,
    isotropic_transform_error,
    registration_rmse,
    inlier_ratio,
    modified_chamfer_distance,
)
from geotransformer_tpu.losses.overall import (
    coarse_matching_loss,
    fine_matching_loss,
    overall_loss,
    evaluate,
)
