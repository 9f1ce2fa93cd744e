"""Serving engine, INT8 quantization, TTA, and COCO-protocol eval tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.models.model import Model, apply_model
from yolo_series_tpu.models.reparam import fuse_model


@pytest.fixture(scope="module")
def tiny_fused():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
                        key=jax.random.PRNGKey(0))
    params, state = fuse_model(m.plan, m.params, m.state)
    return m.plan, params, state


def test_serving_engine_contract(tiny_fused):
    from yolo_series_tpu.infer.serving import ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=2, img_size=128,
                        max_det=50, dtype=jnp.float32)
    x = np.random.default_rng(0).integers(0, 255, (2, 128, 128, 3),
                                          dtype=np.uint8)
    out = eng.infer(x)
    assert set(out) == {"num_dets", "det_boxes", "det_scores", "det_classes"}
    assert out["num_dets"].shape == (2, 1)
    assert out["det_boxes"].shape == (2, 50, 4)
    # partial batch pads and trims
    out1 = eng.infer(x[:1])
    assert out1["det_boxes"].shape == (1, 50, 4)
    np.testing.assert_allclose(out1["det_boxes"], out["det_boxes"][:1],
                               atol=1e-3)


def test_dynamic_batcher(tiny_fused):
    from yolo_series_tpu.infer.serving import DynamicBatcher, ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=4, img_size=128,
                        max_det=20, dtype=jnp.float32)
    batcher = DynamicBatcher(eng, max_delay_ms=20)
    rng = np.random.default_rng(1)
    slots = [batcher.submit(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8))
             for _ in range(6)]
    for s in slots:
        res = DynamicBatcher.wait(s, timeout=60)
        assert res is not None and res["det_boxes"].shape == (20, 4)
    batcher.close()


def test_dynamic_batcher_low_latency_bs1(tiny_fused):
    """Low-latency path (VERDICT r3 item 6): with a compiled bs1 engine,
    a request that finds the queue empty dispatches IMMEDIATELY instead
    of waiting max_delay_ms for co-batching; results must equal the
    direct bs1 engine call."""
    import time

    from yolo_series_tpu.infer.serving import DynamicBatcher, ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=4, img_size=128,
                        max_det=20, dtype=jnp.float32)
    eng1 = ServingEngine(plan, params, state, batch_size=1, img_size=128,
                         max_det=20, dtype=jnp.float32)
    eng1.warmup(1)
    # max_delay deliberately huge: without the bs1 fast path each lone
    # request would sit the full 2 s in the co-batching wait
    batcher = DynamicBatcher(eng, max_delay_ms=2000, bs1_engine=eng1)
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
              for _ in range(3)]
    t0 = time.perf_counter()
    for f in frames:
        s = batcher.submit(f)
        res = DynamicBatcher.wait(s, timeout=60)
        want = eng1.infer(f[None])
        assert int(res["num_dets"][0]) == int(want["num_dets"][0, 0])
        np.testing.assert_allclose(res["det_boxes"], want["det_boxes"][0],
                                   atol=1e-3)
    elapsed = time.perf_counter() - t0
    batcher.close()
    assert elapsed < 4.0, \
        f"{elapsed:.1f}s for 3 lone requests — bs1 fast path not engaged"


def test_dynamic_batcher_concurrent_mapping(tiny_fused):
    """16 client threads through the pipelined batcher: every client must
    get the detections for ITS frame (the Triton-protocol invariant the
    load benchmark assumes, tools/bench_serving.py), bit-equal to a
    direct single-image engine call on the same input."""
    import threading

    from yolo_series_tpu.infer.serving import DynamicBatcher, ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=4, img_size=128,
                        max_det=20, dtype=jnp.float32)
    batcher = DynamicBatcher(eng, max_delay_ms=10)
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
              for _ in range(16)]
    expected = [eng.infer(f[None]) for f in frames]
    results = [None] * 16

    def client(i):
        s = batcher.submit(frames[i])
        results[i] = DynamicBatcher.wait(s, timeout=120)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.close()
    for i in range(16):
        assert results[i] is not None, i
        np.testing.assert_array_equal(results[i]["num_dets"],
                                      expected[i]["num_dets"][0])
        np.testing.assert_allclose(results[i]["det_boxes"],
                                   expected[i]["det_boxes"][0], atol=1e-3)


def test_int8_quantization_close_to_fp(tiny_fused):
    from yolo_series_tpu.infer.quant import quantize_model

    plan, params, state = tiny_fused
    qparams, qstate = quantize_model(plan, params, state)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3))
    out_fp, _ = apply_model(plan, params, state, x, training=False)
    out_q, _ = apply_model(plan, qparams, qstate, x, training=False)
    p_fp = np.asarray(out_fp["pred"])
    p_q = np.asarray(out_q["pred"])
    # class/obj probabilities shouldn't move much under int8
    assert np.abs(p_q[..., 4:] - p_fp[..., 4:]).mean() < 0.02
    # boxes within a few pixels on average
    assert np.abs(p_q[..., :2] - p_fp[..., :2]).mean() < 3.0


def test_quantized_tree_is_int8(tiny_fused):
    from yolo_series_tpu.infer.quant import quantize_model

    plan, params, state = tiny_fused
    qparams, _ = quantize_model(plan, params, state)
    leaves = jax.tree_util.tree_flatten_with_path(qparams)[0]
    n_int8 = sum(1 for p, l in leaves
                 if hasattr(l, "dtype") and l.dtype == jnp.int8)
    assert n_int8 > 50  # every conv weight quantized


def test_tta_shapes(tiny_fused):
    from yolo_series_tpu.models.tta import apply_model_tta

    plan, params, state = tiny_fused
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 128, 3))
    pred = apply_model_tta(plan, params, state, x)
    base, _ = apply_model(plan, params, state, x, training=False)
    assert pred.shape[1] > base["pred"].shape[1]  # 3 scales concatenated
    assert pred.shape[2] == base["pred"].shape[2]


def test_coco_eval_perfect_predictions():
    from yolo_series_tpu.eval.coco_eval import COCOEvaluator

    gt = {"images": [{"id": 1}, {"id": 2}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [10, 10, 50, 40], "area": 2000, "iscrowd": 0},
              {"id": 2, "image_id": 1, "category_id": 2,
               "bbox": [100, 100, 30, 30], "area": 900, "iscrowd": 0},
              {"id": 3, "image_id": 2, "category_id": 1,
               "bbox": [5, 5, 120, 120], "area": 14400, "iscrowd": 0}],
          "categories": [{"id": 1}, {"id": 2}]}
    res = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 40], "score": 0.9},
           {"image_id": 1, "category_id": 2, "bbox": [100, 100, 30, 30], "score": 0.8},
           {"image_id": 2, "category_id": 1, "bbox": [5, 5, 120, 120], "score": 0.95}]
    ev = COCOEvaluator(gt, res)
    out = ev.summarize(verbose=False)
    assert out["AP"] == pytest.approx(1.0, abs=1e-6)
    assert out["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_coco_eval_half_wrong():
    from yolo_series_tpu.eval.coco_eval import COCOEvaluator

    gt = {"images": [{"id": 1}],
          "annotations": [
              {"id": i, "image_id": 1, "category_id": 1,
               "bbox": [100 * i, 10, 50, 40], "area": 2000, "iscrowd": 0}
              for i in range(1, 5)],
          "categories": [{"id": 1}]}
    # 2 perfect hits + 2 far-off false positives with lower scores
    res = [{"image_id": 1, "category_id": 1, "bbox": [100, 10, 50, 40], "score": 0.9},
           {"image_id": 1, "category_id": 1, "bbox": [200, 10, 50, 40], "score": 0.85},
           {"image_id": 1, "category_id": 1, "bbox": [900, 900, 10, 10], "score": 0.5},
           {"image_id": 1, "category_id": 1, "bbox": [950, 950, 10, 10], "score": 0.4}]
    ev = COCOEvaluator(gt, res)
    out = ev.summarize(verbose=False)
    assert 0.4 < out["AP50"] < 0.6  # recall caps at 0.5


def test_serving_device_ingest_matches_host_letterbox():
    """ServingEngine(ingest_hw=...) letterboxes raw frames ON DEVICE and
    returns source-pixel detections == host-letterbox + rescale."""
    import jax.numpy as jnp

    from yolo_series_tpu.data.augment import letterbox
    from yolo_series_tpu.infer.serving import ServingEngine
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.models.reparam import fuse_model

    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    hw = (120, 160)
    size = 160
    common = dict(batch_size=2, img_size=size, conf_thres=0.001,
                  max_det=20, dtype=jnp.float32, fast_stem=False)
    eng_dev = ServingEngine(m.plan, params, state, ingest_hw=hw, **common)
    eng_host = ServingEngine(m.plan, params, state, **common)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, *hw, 3), np.uint8)
    out_dev = eng_dev.infer(frames)

    lbs = np.stack([letterbox(f, size, auto=False, scaleup=True)[0]
                    for f in frames])
    _, ratio, pad = letterbox(frames[0], size, auto=False, scaleup=True)
    out_host = eng_host.infer(lbs)

    n_d = np.asarray(out_dev["num_dets"]).ravel()
    n_h = np.asarray(out_host["num_dets"]).ravel()
    np.testing.assert_array_equal(n_d, n_h)
    for b in range(2):
        n = int(n_d[b])
        if n == 0:
            continue
        host_boxes = np.asarray(out_host["det_boxes"][b][:n])
        mapped = (host_boxes - [pad[0], pad[1], pad[0], pad[1]]) / ratio[0]
        mapped = np.clip(mapped, 0, [hw[1], hw[0], hw[1], hw[0]])
        # device bilinear vs cv2 fixed-point shifts borderline candidates
        # slightly; boxes agree to sub-pixel
        np.testing.assert_allclose(np.asarray(out_dev["det_boxes"][b][:n]),
                                   mapped, rtol=1e-3, atol=1.0)
        np.testing.assert_allclose(np.asarray(out_dev["det_scores"][b][:n]),
                                   np.asarray(out_host["det_scores"][b][:n]),
                                   rtol=5e-2, atol=1e-3)


def test_hub_create_and_detect():
    """torch.hub-surface smoke (hub.py, reference hubconf.py:22-83):
    create() returns an inference-ready Detector."""
    from yolo_series_tpu import hub

    det = hub.create("yolov7-tiny", img_size=128)
    img = np.random.default_rng(0).integers(
        0, 255, (160, 200, 3), dtype=np.uint8)
    rows = det(img)
    assert isinstance(rows, np.ndarray) and rows.shape[1] == 6


def test_export_cli_roundtrip(tmp_path, monkeypatch):
    """cli.export (the export_onnx.py-equivalent deploy pipeline): native
    ckpt -> fuse -> deploy ckpt + StableHLO serialization; the deploy
    ckpt loads and detects."""
    import sys
    import yaml as _yaml

    from yolo_series_tpu.models.model import init_model
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.train.checkpoints import save_checkpoint
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.step import init_train_state

    cfg_path = "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml"
    plan = compile_graph(cfg_path)
    params, state = init_model(plan, jax.random.PRNGKey(1))
    ts = init_train_state(params, state, OptimConfig())
    ckpt = tmp_path / "last.ckpt"
    save_checkpoint(str(ckpt), ts, _yaml.safe_load(open(cfg_path)), epoch=0)

    out_mlir = tmp_path / "engine.mlir"
    argv = ["export", "--weights", str(ckpt), "--img-size", "128",
            "--batch-size", "1", "--max-det", "10",
            "--stablehlo", str(out_mlir)]
    monkeypatch.setattr(sys, "argv", argv)
    from yolo_series_tpu.cli.export import main as export_main
    export_main()

    deploy = ckpt.with_suffix("").as_posix() + ".deploy.ckpt"
    from yolo_series_tpu.infer.detector import Detector
    det = Detector.from_checkpoint(deploy, img_size=128, dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 255, (140, 160, 3),
                                            dtype=np.uint8)
    rows = det(img)
    assert rows.shape[1] == 6
    assert out_mlir.exists() and out_mlir.stat().st_size > 10_000


def test_detect_video_end_to_end(tmp_path, monkeypatch):
    """cli.detect on a synthesized mp4 (reference detect.py video branch:
    LoadImages video iterator datasets.py:165-188 + VideoWriter save
    detect.py:231-253): every frame is processed, an annotated .mp4 with
    the same frame count is written, and --save-txt emits one txt per
    FRAME (reference txt_path += f'_{frame}', detect.py:165)."""
    import sys

    import cv2
    import yaml as _yaml

    from yolo_series_tpu.models.model import init_model
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.train.checkpoints import save_checkpoint
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.step import init_train_state

    cfg_path = "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml"
    plan = compile_graph(cfg_path)
    params, state = init_model(plan, jax.random.PRNGKey(2))
    ts = init_train_state(params, state, OptimConfig())
    ckpt = tmp_path / "w.ckpt"
    save_checkpoint(str(ckpt), ts, _yaml.safe_load(open(cfg_path)), epoch=0)

    vid = tmp_path / "clip.mp4"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                         (160, 120))
    if not wr.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    rng = np.random.default_rng(3)
    n = 7
    for _ in range(n):
        wr.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    wr.release()

    argv = ["detect", "--weights", str(ckpt), "--source", str(vid),
            "--img-size", "128", "--conf-thres", "0.0001",
            "--project", str(tmp_path / "runs"), "--save-txt"]
    monkeypatch.setattr(sys, "argv", argv)
    from yolo_series_tpu.cli.detect import main as detect_main
    detect_main()

    out = tmp_path / "runs" / "exp" / "clip.mp4"
    assert out.exists(), "annotated video not written"
    cap = cv2.VideoCapture(str(out))
    frames = 0
    while cap.read()[0]:
        frames += 1
    cap.release()
    assert frames == n
    txts = sorted((tmp_path / "runs" / "exp" / "labels").glob("clip_*.txt"))
    assert len(txts) == n, f"expected one txt per frame, got {len(txts)}"


def test_detect_view_img(tmp_path, monkeypatch, capsys):
    """--view-img (reference detect.py:171-175): shows every processed
    frame via cv2.imshow when a display exists, and on a headless box
    (cv2.error) warns ONCE and keeps processing instead of crashing."""
    import cv2
    import yaml as _yaml

    from yolo_series_tpu.cli.detect import detect, make_parser
    from yolo_series_tpu.models.model import init_model
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.train.checkpoints import save_checkpoint
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.step import init_train_state

    cfg_path = "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml"
    plan = compile_graph(cfg_path)
    params, state = init_model(plan, jax.random.PRNGKey(2))
    ts = init_train_state(params, state, OptimConfig())
    ckpt = tmp_path / "w.ckpt"
    save_checkpoint(str(ckpt), ts, _yaml.safe_load(open(cfg_path)), epoch=0)

    rng = np.random.default_rng(5)
    src = tmp_path / "imgs"
    src.mkdir()
    n = 3
    for i in range(n):
        cv2.imwrite(str(src / f"im{i}.jpg"),
                    rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))

    base = ["--weights", str(ckpt), "--source", str(src),
            "--img-size", "128", "--conf-thres", "0.0001",
            "--view-img", "--nosave"]

    shown = []
    monkeypatch.setenv("DISPLAY", ":0")
    monkeypatch.setattr(cv2, "imshow", lambda name, im: shown.append(name))
    monkeypatch.setattr(cv2, "waitKey", lambda ms: -1)
    detect(make_parser().parse_args(
        base + ["--project", str(tmp_path / "runs_view")]))
    assert len(shown) == n, f"imshow called {len(shown)}x, expected {n}"

    # headless: the env probe must disable the view BEFORE any imshow
    # call (this cv2/Qt build hard-aborts the process inside imshow)
    def _would_abort(name, im):
        raise AssertionError("imshow must not be reached headless")

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    monkeypatch.setattr(cv2, "imshow", _would_abort)
    detect(make_parser().parse_args(
        base + ["--project", str(tmp_path / "runs_headless")]))
    outerr = capsys.readouterr().out
    assert outerr.count("--view-img requires a display") == 1
    assert f"im{n - 1}.jpg" in outerr, "processing stopped after warning"


def test_dynamic_batcher_close_wakes_stranded(tiny_fused):
    """close() must terminate the pipeline promptly and set EVERY waiter's
    event: requests stranded in the queues resolve with result None
    instead of hanging a client thread forever (the pre-fix dispatch
    thread could wedge on a full _done queue once completers exited)."""
    import time

    from yolo_series_tpu.infer.serving import DynamicBatcher, ServingEngine

    plan, params, state = tiny_fused
    eng = ServingEngine(plan, params, state, batch_size=2, img_size=128,
                        max_det=10, dtype=jnp.float32)

    def slow_stage(frames):  # pile up undispatched submissions
        time.sleep(0.25)
        return np.stack(frames)

    batcher = DynamicBatcher(eng, max_delay_ms=1, inflight=1,
                             stage_fn=slow_stage, completers=1)
    rng = np.random.default_rng(0)
    slots = [batcher.submit(
        rng.integers(0, 255, (128, 128, 3), dtype=np.uint8))
        for _ in range(12)]
    time.sleep(0.2)  # let a couple of batches enter the pipeline
    t0 = time.perf_counter()
    batcher.close()
    assert time.perf_counter() - t0 < 15, "close() wedged"
    for i, s in enumerate(slots):
        assert s["event"].wait(5), f"waiter {i} left hanging across close()"
        if s["result"] is not None:  # completed ones must be well-formed
            assert s["result"]["det_boxes"].shape == (10, 4)
    assert not batcher.worker.is_alive()
    assert not any(t.is_alive() for t in batcher.completer_pool)
