from geotransformer_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    DATA_AXIS,
)
from geotransformer_tpu.parallel.train import (
    TrainState,
    make_lr_schedule,
    make_optimizer,
    init_train_state,
    make_train_step,
    make_eval_step,
    stack_batches,
)
