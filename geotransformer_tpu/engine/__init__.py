from geotransformer_tpu.engine.logger import create_logger
from geotransformer_tpu.engine.meters import AverageMeter, SummaryBoard
from geotransformer_tpu.engine.timer import Timer, TimerDict
from geotransformer_tpu.engine.checkpoint import CheckpointManager
from geotransformer_tpu.engine.trainer import Trainer
from geotransformer_tpu.engine.tester import Tester
