from yolo_series_tpu.ops.boxes import (
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyn2xy,
    box_iou,
    bbox_iou,
    bbox_ioa,
    wh_iou,
)
from yolo_series_tpu.ops.nms import batched_nms, nms_padded
