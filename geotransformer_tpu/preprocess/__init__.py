from geotransformer_tpu.preprocess.voxel import grid_subsample, grid_subsample_single
from geotransformer_tpu.preprocess.neighbors import radius_search
from geotransformer_tpu.preprocess.pyramid import (
    build_pyramid,
    pad_registration_batch,
    caps_for_pyramid,
    build_split_tables,
    fit_split_for_table,
    round_up,
    PAD_COORD,
)
from geotransformer_tpu.preprocess.device import (
    build_pyramid_device,
    pad_stage0,
    prepare_raw_pair,
    DevicePreprocessPlan,
)
from geotransformer_tpu.preprocess.calibrate import (
    calibrate_neighbor_limits,
    calibrate_stage_caps,
    calibrate_stage_cap_buckets,
    calibrate_inverse_limits,
    calibrate_split_specs,
)
