from yolo_series_tpu.data.augment import letterbox
from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
