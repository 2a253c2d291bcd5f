from valle_tpu.train.state import TrainState, partition_params, merge_params
from valle_tpu.train.step import init_train_state, make_eval_step, make_train_step
from valle_tpu.train.checkpoint import CheckpointManager
from valle_tpu.train.metrics import MetricsTracker
