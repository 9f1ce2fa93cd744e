#!/usr/bin/env python
"""Minimal HTTP detection server around infer.serving.ServingEngine —
the Triton-server role (deploy/triton-inference-server/) with the same
response contract: num_dets / det_boxes / det_scores / det_classes.

POST /v1/detect with a JPEG/PNG body (or JSON {"image": b64}) returns
JSON detections in original-image coordinates.

Usage: python tools/serve_http.py --weights best.ckpt [--port 8000]
       python tools/serve_http.py --weights best.ckpt --dummy   # smoke test
"""

import argparse
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import cv2
import numpy as np


def build_engine(opt):
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.infer.serving import DynamicBatcher, ServingEngine
    from yolo_series_tpu.train.checkpoints import load_checkpoint_any

    plan, params, state = load_checkpoint_any(opt.weights, opt.cfg)
    params, state = fuse_model(plan, params, state)
    if opt.int8:
        from yolo_series_tpu.infer.quant import quantize_model
        params, state = quantize_model(plan, params, state)
    engine = ServingEngine(plan, params, state, batch_size=opt.batch_size,
                           img_size=opt.img_size, conf_thres=opt.conf_thres,
                           iou_thres=opt.iou_thres, max_det=opt.max_det)
    engine.warmup()
    eng1 = None
    if opt.low_latency:
        # compiled bs1 program: lone requests dispatch immediately instead
        # of waiting --max-delay-ms for co-batching (Triton
        # preferred-batch-size behavior at low load)
        eng1 = ServingEngine(plan, params, state, batch_size=1,
                             img_size=opt.img_size, conf_thres=opt.conf_thres,
                             iou_thres=opt.iou_thres, max_det=opt.max_det)
        eng1.warmup(1)
    return plan, engine, DynamicBatcher(engine, max_delay_ms=opt.max_delay_ms,
                                        bs1_engine=eng1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--max-det", type=int, default=100)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument("--low-latency", action="store_true",
                    help="also compile a bs1 program; queue-empty requests "
                         "skip the co-batching wait")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--dummy", action="store_true",
                    help="send one ones-buffer through the engine and exit "
                         "(the Triton client's dummy mode)")
    opt = ap.parse_args()

    from yolo_series_tpu.data.augment import letterbox
    from yolo_series_tpu.eval.evaluator import scale_coords_np

    plan, engine, batcher = build_engine(opt)
    names = plan.names

    if opt.dummy:
        x = np.ones((opt.batch_size, opt.img_size, opt.img_size, 3), np.uint8)
        out = engine.infer(x)
        print(json.dumps({k: np.asarray(v).shape for k, v in out.items()},
                         default=str))
        print("dummy inference OK")
        return

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/v1/detect":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if self.headers.get("Content-Type", "").startswith("application/json"):
                body = base64.b64decode(json.loads(body)["image"])
            img0 = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
            if img0 is None:
                self.send_error(400, "undecodable image")
                return
            img, ratio, dwdh = letterbox(img0, opt.img_size, auto=False)
            slot = batcher.submit(np.ascontiguousarray(img[:, :, ::-1]))
            res = batcher.wait(slot, timeout=10.0)
            n = int(res["num_dets"][0])
            boxes = res["det_boxes"][:n].copy()
            boxes = scale_coords_np((opt.img_size, opt.img_size), boxes,
                                    img0.shape[:2],
                                    ((ratio[1], ratio[0]), dwdh))
            payload = {
                "num_dets": n,
                "det_boxes": boxes.tolist(),
                "det_scores": res["det_scores"][:n].tolist(),
                "det_classes": res["det_classes"][:n].tolist(),
                "names": [names[int(c)] if int(c) < len(names) else str(int(c))
                          for c in res["det_classes"][:n]],
            }
            data = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("0.0.0.0", opt.port), Handler)
    print(f"serving on :{opt.port} (batch {opt.batch_size}, "
          f"dynamic batching {opt.max_delay_ms}ms)")
    server.serve_forever()


if __name__ == "__main__":
    main()
