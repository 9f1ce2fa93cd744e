from yolo_series_tpu.eval.metrics import (
    ap_per_class, compute_ap, fitness, ConfusionMatrix, match_predictions,
)
