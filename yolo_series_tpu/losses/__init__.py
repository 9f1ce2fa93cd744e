from yolo_series_tpu.losses.yolo_loss import LossHyp, make_compute_loss
from yolo_series_tpu.losses.ota import make_compute_loss_ota
