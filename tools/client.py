#!/usr/bin/env python
"""Detection-server client (the Triton gRPC client's role,
deploy/triton-inference-server/client.py:160-334): dummy / image / video
modes against tools/serve_http.py.

Usage:
  python tools/client.py dummy --url http://localhost:8000
  python tools/client.py image --input img.jpg [--output out.jpg]
  python tools/client.py video --input in.mp4 --output out.mp4
"""

import argparse
import json
import sys
import urllib.request


def post(url, payload: bytes):
    req = urllib.request.Request(url + "/v1/detect", data=payload,
                                 headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["dummy", "image", "video"])
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", default=None)
    opt = ap.parse_args()

    import cv2
    import numpy as np

    if opt.mode == "dummy":
        img = np.full((640, 640, 3), 128, np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        res = post(opt.url, buf.tobytes())
        print(json.dumps(res))
        print("dummy request OK")
        return

    if opt.mode == "image":
        with open(opt.input, "rb") as f:
            res = post(opt.url, f.read())
        print(f"{opt.input}: {res['num_dets']} detections")
        for b, s, n in zip(res["det_boxes"], res["det_scores"], res["names"]):
            print(f"  {n} {s:.2f} {[round(v, 1) for v in b]}")
        if opt.output:
            img = cv2.imread(opt.input)
            for b, s, n in zip(res["det_boxes"], res["det_scores"], res["names"]):
                x1, y1, x2, y2 = map(int, b)
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
                cv2.putText(img, f"{n} {s:.2f}", (x1, y1 - 4), 0, 0.6,
                            (0, 255, 0), 2)
            cv2.imwrite(opt.output, img)
            print(f"saved {opt.output}")
        return

    cap = cv2.VideoCapture(opt.input)
    writer = None
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        ok, buf = cv2.imencode(".jpg", frame)
        res = post(opt.url, buf.tobytes())
        for b, s, name in zip(res["det_boxes"], res["det_scores"], res["names"]):
            x1, y1, x2, y2 = map(int, b)
            cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(frame, f"{name} {s:.2f}", (x1, y1 - 4), 0, 0.6,
                        (0, 255, 0), 2)
        if opt.output:
            if writer is None:
                h, w = frame.shape[:2]
                writer = cv2.VideoWriter(opt.output,
                                         cv2.VideoWriter_fourcc(*"mp4v"),
                                         cap.get(cv2.CAP_PROP_FPS) or 30, (w, h))
            writer.write(frame)
        n += 1
        if n % 25 == 0:
            print(f"{n} frames...")
    if writer:
        writer.release()
    print(f"done: {n} frames")


if __name__ == "__main__":
    main()
