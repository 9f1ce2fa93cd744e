from yolo_series_tpu.train.optim import OptimConfig, make_optimizer, param_groups
from yolo_series_tpu.train.schedules import one_cycle_lr, linear_lr, warmup_factors
from yolo_series_tpu.train.ema import ema_decay, ema_update
from yolo_series_tpu.train.step import TrainState, make_train_step
