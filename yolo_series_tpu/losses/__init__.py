from yolo_series_tpu.losses.yolo_loss import LossHyp, make_compute_loss
from yolo_series_tpu.losses.ota import make_compute_loss_ota
from yolo_series_tpu.losses.aux_ota import make_compute_loss_aux_ota
from yolo_series_tpu.losses.bin import SigmoidBin
from yolo_series_tpu.losses.bin_ota import make_compute_loss_bin_ota
from yolo_series_tpu.losses.ranking import alrp_loss, ap_loss, rank_sort_loss
