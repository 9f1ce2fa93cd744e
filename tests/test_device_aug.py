"""Device-side augmentation tail vs the host cv2 path (SURVEY §2.8.3).

The label math must match the host random_perspective bit-for-bit (shared
formulas); the pixel path is allowed bilinear/LUT rounding differences
(asserted within a few /255).
"""

import random

import cv2
import numpy as np
import pytest

from yolo_series_tpu.data import augment as A
from yolo_series_tpu.data import device_aug as DA

HYP = {"degrees": 10.0, "translate": 0.1, "scale": 0.5, "shear": 2.0,
       "perspective": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
       "flipud": 0.5, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.5,
       "copy_paste": 0.0}


def _structured_canvas(cs=256, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((cs, cs, 3), 114, np.uint8)
    for _ in range(12):
        x, y = rng.integers(0, cs - 40, 2)
        w, h = rng.integers(10, 40, 2)
        color = tuple(int(c) for c in rng.integers(0, 255, 3))
        cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)),
                      color, -1)
    return cv2.GaussianBlur(img, (0, 0), 1.5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_warp_matches_cv2(seed):
    import jax.numpy as jnp

    s, cs = 128, 256
    canvas = _structured_canvas(cs, seed)
    rng = random.Random(seed)
    M, sc, out_hw = DA.sample_perspective_params(
        HYP["degrees"], HYP["translate"], HYP["scale"], HYP["shear"], 0.0,
        (-s // 2, -s // 2), (cs, cs), rng)
    assert out_hw == (s, s)
    want = cv2.warpAffine(canvas, M[:2], dsize=(s, s),
                          borderValue=(114, 114, 114))

    aug = DA.make_device_augment(s, cs)
    got = aug(jnp.asarray(canvas[None]),
              jnp.asarray(DA.invert_affine(M)[None]),
              jnp.ones((1, 3), np.float32),
              np.zeros((1, 2), bool),
              np.zeros((1,), np.int32), np.ones((1,), np.float32))
    got = (np.asarray(got[0])[..., ::-1] * 255.0)  # RGB->BGR, denorm
    diff = np.abs(got.astype(np.float32) - want.astype(np.float32))
    # cv2 INTER_LINEAR quantizes bilinear coefficients to 5 bits; on
    # high-contrast edges that costs up to ~8/255 vs exact float taps, so
    # the envelope is: most pixels near-exact, a small edge fraction off
    assert np.median(diff) <= 1.0
    assert (diff > 8).mean() < 0.02, f"{(diff > 8).mean():.4f} px off by >8"
    assert diff.mean() < 1.5


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_label_math_matches_host_random_perspective(seed):
    s, cs = 128, 256
    canvas = _structured_canvas(cs, seed)
    rng_np = np.random.default_rng(seed)
    n = 14
    targets = np.zeros((n, 5), np.float32)
    x1 = rng_np.uniform(0, cs - 40, n)
    y1 = rng_np.uniform(0, cs - 40, n)
    targets[:, 1] = x1
    targets[:, 2] = y1
    targets[:, 3] = x1 + rng_np.uniform(8, 40, n)
    targets[:, 4] = y1 + rng_np.uniform(8, 40, n)
    targets[:, 0] = rng_np.integers(0, 5, n)

    border = (-s // 2, -s // 2)
    r1, r2 = random.Random(seed), random.Random(seed)
    _, want = A.random_perspective(
        canvas.copy(), targets.copy(), degrees=HYP["degrees"],
        translate=HYP["translate"], scale=HYP["scale"], shear=HYP["shear"],
        perspective=0.0, border=border, rng=r1)
    M, sc, out_hw = DA.sample_perspective_params(
        HYP["degrees"], HYP["translate"], HYP["scale"], HYP["shear"], 0.0,
        border, (cs, cs), r2)
    got = DA.warp_labels(targets.copy(), M, sc, out_hw, perspective=0.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_hsv_matches_cv2_lut(seed):
    import jax.numpy as jnp

    s = 96
    img = _structured_canvas(s, seed)  # BGR
    rng = random.Random(seed)
    gains = (np.array([rng.uniform(-1, 1) for _ in range(3)])
             * [HYP["hsv_h"], HYP["hsv_s"], HYP["hsv_v"]] + 1)

    want = img.copy()

    class _R:
        def __init__(self):
            self.i = 0

        def uniform(self, a, b):
            # replay the same three draws
            v = (gains - 1) / [HYP["hsv_h"], HYP["hsv_s"], HYP["hsv_v"]]
            out = v[self.i]
            self.i += 1
            return out

    A.augment_hsv(want, HYP["hsv_h"], HYP["hsv_s"], HYP["hsv_v"], _R())

    # device path: identity warp on an s-canvas
    aug = DA.make_device_augment(s, s)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    got = aug(jnp.asarray(img[None]), jnp.asarray(ident[None]),
              jnp.asarray(gains[None].astype(np.float32)),
              np.zeros((1, 2), bool), np.zeros((1,), np.int32),
              np.ones((1,), np.float32))
    got = np.asarray(got[0])[..., ::-1] * 255.0
    diff = np.abs(got - want.astype(np.float32))
    # LUT truncation vs float math: allow small per-pixel deviation
    assert np.median(diff) <= 2.0
    assert (diff > 6).mean() < 0.02, f"{(diff > 6).mean():.4f} px off by >6"


def test_device_tail_loader_and_train_step(tmp_path):
    """End-to-end: device_tail loader -> device aug -> one train step."""
    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, "/root/repo")
    from tools.bench_loader import make_synthetic_dataset
    from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
    from yolo_series_tpu.losses import LossHyp, make_compute_loss_ota
    from yolo_series_tpu.models.model import Model
    from yolo_series_tpu.train.optim import OptimConfig
    from yolo_series_tpu.train.schedules import warmup_factors
    from yolo_series_tpu.train.step import init_train_state, make_train_step

    files = make_synthetic_dataset(tmp_path, 8, hw=(200, 260))
    img = 96
    ds = DetectionDataset(files, img_size=img, batch_size=4, augment=True,
                          hyp=HYP, device_tail=True,
                          cache_path=str(tmp_path / "c.npz"))
    assert ds.device_tail
    loader = create_loader(ds, batch_size=4, shuffle=True, max_labels=64)
    batch = next(iter(loader))
    assert "canvases" not in batch  # pixels ship exactly once, as tiles
    assert batch["tiles"].shape == (4, 4, img, img, 3)
    assert batch["origins"].shape == (4, 4, 2)
    assert batch["minv"].shape == (4, 2, 3)

    aug = DA.make_device_augment(img, 2 * img, mosaic=True)
    imgs = aug(jnp.asarray(batch["tiles"]), jnp.asarray(batch["origins"]),
               jnp.asarray(batch["centers"]), jnp.asarray(batch["minv"]),
               jnp.asarray(batch["hsv"]), jnp.asarray(batch["flips"]),
               jnp.asarray(batch["mix_idx"]), jnp.asarray(batch["mix_w"]))
    arr = np.asarray(imgs)
    assert arr.shape == (4, img, img, 3)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert arr.std() > 0.01  # not all-border

    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    loss_fn = make_compute_loss_ota(m.plan.head, LossHyp())
    cfg = OptimConfig()
    ts = init_train_state(m.params, m.state, cfg)
    step = make_train_step(m.plan, loss_fn, cfg, compute_dtype=jnp.float32)
    lr_groups, mom = warmup_factors(jnp.float32(0), 100, jnp.float32(0.0),
                                    300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)
    ts2, metrics = step(ts, imgs, jnp.asarray(batch["labels"]),
                        jnp.asarray(batch["label_mask"]), lr_groups, mom)
    assert np.isfinite(float(metrics["total"]))


@pytest.mark.parametrize("trial", [0, 1, 2, 3])
def test_device_mosaic_compose_matches_cv2(trial):
    """Device 4-tile compose (scale_and_translate placement + quadrant
    select) must be PIXEL-EXACT vs augment.mosaic4's cv2 slicing, and the
    shared geometry must reproduce its label shifts (reference
    load_mosaic, datasets.py:1001-1064)."""
    import jax.numpy as jnp

    s = 64
    rng = np.random.default_rng(trial)
    imgs, lbs, hw = [], [], []
    for _ in range(4):
        h, w = int(rng.integers(20, s + 1)), int(rng.integers(20, s + 1))
        imgs.append(rng.integers(0, 255, (h, w, 3), np.uint8))
        hw.append((h, w))
        n = int(rng.integers(0, 4))
        lb = np.zeros((n, 5), np.float32)
        if n:
            lb[:, 1] = rng.uniform(0, w - 5, n)
            lb[:, 3] = lb[:, 1] + 4
            lb[:, 2] = rng.uniform(0, h - 5, n)
            lb[:, 4] = lb[:, 2] + 4
        lbs.append(lb)
    r1, r2 = random.Random(trial), random.Random(trial)
    want_canvas, want_labels = A.mosaic4(
        [i.copy() for i in imgs], [l.copy() for l in lbs], s, r1)
    yc = int(r2.uniform(s // 2, 2 * s - s // 2))
    xc = int(r2.uniform(s // 2, 2 * s - s // 2))
    origins, pads = DA.mosaic4_geometry(hw, s, yc, xc)
    tiles = np.full((4, s, s, 3), 114, np.uint8)
    for i, (h, w) in enumerate(hw):
        tiles[i, :h, :w] = imgs[i]
    fn = DA.make_mosaic_compose(s)
    got = np.asarray(fn(jnp.asarray(tiles[None]), jnp.asarray(origins[None]),
                        jnp.asarray(np.array([[yc, xc]], np.float32))))[0]
    np.testing.assert_array_equal(got, want_canvas)
    out = []
    for i in range(4):
        if len(lbs[i]):
            lb = lbs[i].copy()
            lb[:, [1, 3]] += pads[i][0]
            lb[:, [2, 4]] += pads[i][1]
            out.append(lb)
    got_lb = np.concatenate(out, 0) if out else np.zeros((0, 5), np.float32)
    if len(got_lb):
        got_lb[:, 1:5] = got_lb[:, 1:5].clip(0, 2 * s)
    np.testing.assert_allclose(got_lb, want_labels, atol=1e-5)


def test_compose_quadrant_and_single_tile_forms():
    """The two non-mosaic riders of the tile composer: a host canvas split
    into its 4 quadrants composes back EXACTLY, and a single (s, s)
    letterbox tile with degenerate partners reproduces the centered 2s
    embed (data/datasets.py device_item)."""
    import jax.numpy as jnp

    s = 48
    rng = np.random.default_rng(0)
    fn = DA.make_mosaic_compose(s)

    canvas = rng.integers(0, 255, (2 * s, 2 * s, 3), np.uint8)
    tiles = np.stack([canvas[:s, :s], canvas[:s, s:],
                      canvas[s:, :s], canvas[s:, s:]])
    origins = np.array([[0, 0], [0, s], [s, 0], [s, s]], np.float32)
    got = np.asarray(fn(jnp.asarray(tiles[None]), jnp.asarray(origins[None]),
                        jnp.asarray(np.array([[s, s]], np.float32))))[0]
    np.testing.assert_array_equal(got, canvas)

    base = rng.integers(0, 255, (s, s, 3), np.uint8)
    t1 = np.full((4, s, s, 3), 114, np.uint8)
    t1[0] = base
    off = s // 2
    o1, _ = DA.mosaic4_geometry([(s, s), (0, 0), (0, 0), (0, 0)], s,
                                off + s, off + s)
    got1 = np.asarray(fn(jnp.asarray(t1[None]), jnp.asarray(o1[None]),
                         jnp.asarray(np.array([[off + s, off + s]],
                                              np.float32))))[0]
    want1 = np.full((2 * s, 2 * s, 3), 114, np.uint8)
    want1[off:off + s, off:off + s] = base
    np.testing.assert_array_equal(got1, want1)


def test_device_item_rejects_perspective(tmp_path):
    """The device warp is affine-only; perspective hyps must fail loudly
    instead of silently misaligning pixels vs (correct) labels."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.bench_loader import make_synthetic_dataset
    from yolo_series_tpu.data.datasets import DetectionDataset

    files = make_synthetic_dataset(tmp_path, 4, hw=(96, 128))
    hyp = dict(HYP, perspective=0.0005)
    ds = DetectionDataset(files, img_size=96, batch_size=2, augment=True,
                          hyp=hyp, device_tail=True,
                          cache_path=str(tmp_path / "c.npz"))
    with pytest.raises(ValueError, match="perspective"):
        ds.device_item(0)


@pytest.mark.parametrize("hw", [(480, 640), (720, 1280), (640, 640)])
def test_device_letterbox_matches_cv2(hw):
    import jax.numpy as jnp

    from yolo_series_tpu.data.device_aug import make_device_letterbox

    img = _structured_canvas(256, 1)
    img = cv2.resize(img, (hw[1], hw[0]))
    want, ratio_w, pad_w = A.letterbox(img.copy(), 320, auto=False,
                                       scaleup=True)
    fn, ratio, pad = make_device_letterbox(hw, dst=320)
    got = np.asarray(fn(jnp.asarray(img[None])))[0]
    assert got.shape == want.shape
    assert ratio == pytest.approx(ratio_w, abs=1e-9)
    assert pad == pytest.approx(pad_w, abs=1e-9)
    diff = np.abs(got.astype(np.float32) - want.astype(np.float32))
    # cv2 INTER_LINEAR fixed-point vs exact bilinear: edge-pixel envelope
    assert np.median(diff) <= 1.0
    assert (diff > 8).mean() < 0.02


@pytest.mark.parametrize("seed", [0, 1])
def test_separable_warp_matches_cv2(seed):
    """scale+translate-only warp (the DEFAULT hyps: degrees=shear=
    perspective=0) through the separable matmul path == cv2.warpAffine."""
    import jax.numpy as jnp

    s, cs = 128, 256
    canvas = _structured_canvas(cs, seed)
    rng = random.Random(seed)
    M, sc, out_hw = DA.sample_perspective_params(
        0.0, 0.1, 0.5, 0.0, 0.0, (-s // 2, -s // 2), (cs, cs), rng)
    want = cv2.warpAffine(canvas, M[:2], dsize=(s, s),
                          borderValue=(114, 114, 114))
    args = (jnp.asarray(canvas[None]),
            jnp.asarray(DA.invert_affine(M)[None]),
            jnp.ones((1, 3), np.float32), np.zeros((1, 2), bool),
            np.zeros((1,), np.int32), np.ones((1,), np.float32))
    aug = DA.make_device_augment(s, cs, separable=True)
    got = np.asarray(aug(*args)[0])[..., ::-1] * 255.0
    diff = np.abs(got.astype(np.float32) - want.astype(np.float32))
    assert np.median(diff) <= 1.0
    assert (diff > 8).mean() < 0.02, f"{(diff > 8).mean():.4f} px off by >8"

    # sub-pixel-alignment gate: the separable path must agree with the
    # exact per-pixel gather warp almost everywhere — a systematic
    # 0.5*(a-1) px offset (the scale_and_translate pixel-center
    # convention, caught in round 2 review) fails this
    exact = DA.make_device_augment(s, cs, separable=False)
    ref = np.asarray(exact(*args)[0])[..., ::-1] * 255.0
    dsep = np.abs(got.astype(np.float32) - ref.astype(np.float32))
    assert dsep.mean() < 0.1, f"separable-vs-gather mean {dsep.mean():.3f}"
    assert (dsep > 1).mean() < 1e-3
