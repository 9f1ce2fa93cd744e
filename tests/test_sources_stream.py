"""File-backed LoadStreams / LoadWebcam coverage (VERDICT r4 item 7).

cv2.VideoCapture opens plain video files, so the camera/RTSP paths in
infer/sources.py (reference utils/datasets.py LoadWebcam :213-268,
LoadStreams :271-349) are drivable offline: synthesize an mp4 whose
frame index is encoded in the blue channel, point the sources at it,
and assert the threaded grabber's every-4th-frame retrieve semantics
and clean shutdown.
"""

import time

import cv2
import numpy as np
import pytest

from yolo_series_tpu.infer.sources import LoadStreams, LoadWebcam

N_FRAMES = 30
STEP = 8  # mp4 is lossy; values spaced 8 apart survive (error ~1)


def _frame_index(img):
    return int(round(float(img[:, :, 0].mean()) / STEP))


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("stream") / "cam.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (64, 48))
    assert w.isOpened()
    for i in range(N_FRAMES):
        f = np.zeros((48, 64, 3), np.uint8)
        f[:, :, 0] = i * STEP
        w.write(f)
    w.release()
    return str(p)


def test_load_streams_grabber_semantics(video_file, tmp_path):
    # two "streams" backed by the same file (reference datasets.py:281-285
    # reads one source per line)
    txt = tmp_path / "streams.txt"
    txt.write_text(f"{video_file}\n{video_file}\n")
    ls = LoadStreams(str(txt), img_size=64, stride=32)
    try:
        assert len(ls.sources) == 2
        # constructor primes imgs with the first frame (datasets.py:292)
        assert all(_frame_index(im) == 0 for im in ls.imgs)
        # grabber retrieves every 4th grabbed frame (datasets.py:318):
        # the primer read consumed frame 0, so retrieved indices are
        # multiples of 4
        seen = set()
        deadline = time.time() + 10.0
        while time.time() < deadline and len(seen) < 3:
            for im in ls.imgs:
                idx = _frame_index(im)
                if idx > 0:
                    seen.add(idx)
            time.sleep(0.02)
        assert seen, "grabber thread never updated a frame"
        assert all(i % 4 == 0 for i in seen), f"non-4th frames: {seen}"

        # iterator yields a letterboxed batch over all streams
        it = iter(ls)
        srcs, imgs, img0, _cap, ratios, dwdhs = next(it)
        assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.uint8
        assert len(img0) == 2 and img0[0].shape == (48, 64, 3)
        assert len(ratios) == 2 and len(dwdhs) == 2
    finally:
        ls.close()
    # clean shutdown: threads joined, captures released
    assert all(not t.is_alive() for t in ls.threads)
    assert all(not c.isOpened() for c in ls.caps)


def test_load_webcam_file_pipe(video_file):
    # non-numeric pipe -> passed to VideoCapture as a path
    # (reference datasets.py:218-224)
    wc = LoadWebcam(pipe=video_file, img_size=64, stride=32)
    try:
        it = iter(wc)
        last = -1
        for _ in range(5):
            path, img, img0, _cap, ratio, dwdh = next(it)
            assert path == video_file
            assert img.shape == (64, 64, 3) and img.dtype == np.uint8
            # webcam path mirrors horizontally (datasets.py:249) — a solid
            # frame is flip-invariant, so the index still decodes; frames
            # must advance monotonically (sequential read, no skipping)
            idx = _frame_index(img0)
            assert idx == last + 1
            last = idx
    finally:
        wc.cap.release()
