"""Evaluator auto-label flags (reference test.py:124, 147-153):
--save-txt / --save-conf per-image txts and --save-hybrid ground-truth
injection into NMS as conf-1.0 candidates."""

import cv2
import numpy as np
import pytest

from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
from yolo_series_tpu.eval.evaluator import evaluate
from yolo_series_tpu.models.graph import compile_graph
from yolo_series_tpu.models.model import init_model


@pytest.fixture(scope="module")
def tiny_eval_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalflags")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(3)
    n_labels = {}
    for i in range(4):
        img = np.full((96, 128, 3), 90, np.uint8)
        rows = []
        # well-separated boxes so conf-1.0 hybrid rows survive NMS
        for k in range(2):
            cx, cy, bw, bh = 0.25 + 0.5 * k, 0.3 + 0.35 * k, 0.2, 0.2
            cv2.rectangle(img, (int((cx - bw / 2) * 128), int((cy - bh / 2) * 96)),
                          (int((cx + bw / 2) * 128), int((cy + bh / 2) * 96)),
                          (0, 0, 255), -1)
            rows.append(f"{k} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        cv2.imwrite(str(root / "images" / f"ef{i}.jpg"), img)
        (root / "labels" / f"ef{i}.txt").write_text("\n".join(rows))
        n_labels[f"ef{i}"] = len(rows)

    import jax
    plan = compile_graph(
        "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml", nc=3)
    params, state = init_model(plan, jax.random.PRNGKey(0))
    ds = DetectionDataset(str(root / "images"), img_size=64, batch_size=4,
                          augment=False)
    return plan, params, state, ds, n_labels


def test_save_txt_and_hybrid(tiny_eval_setup, tmp_path):
    import jax.numpy as jnp

    plan, params, state, ds, n_labels = tiny_eval_setup
    loader = create_loader(ds, batch_size=4, shuffle=False, max_labels=8,
                           drop_last=False)
    out = tmp_path / "labels"
    out.mkdir()
    # conf 0.9: with random-init weights only the injected conf-1.0
    # ground-truth rows can pass, so the txts must contain exactly the
    # hybrid GT detections
    evaluate(plan, params, state, loader, names=("a", "b", "c"),
             conf_thres=0.9, compute_dtype=jnp.float32,
             save_txt_dir=str(out), save_conf=True, save_hybrid=True,
             plots_dir=str(tmp_path))
    # first-batch mosaics (reference test.py:216-222)
    assert (tmp_path / "test_batch0_labels.jpg").exists()
    assert (tmp_path / "test_batch0_pred.jpg").exists()
    files = sorted(out.glob("*.txt"))
    assert [f.stem for f in files] == sorted(n_labels)
    for f in files:
        rows = np.loadtxt(f, ndmin=2)
        assert rows.shape == (n_labels[f.stem], 6)  # cls x y w h conf
        assert (rows[:, 5] >= 0.9).all()
        assert rows[:, 1:5].min() >= 0 and rows[:, 1:5].max() <= 1
        # the two GT boxes come back (normalized native-space xywh)
        got = rows[np.argsort(rows[:, 1]), 1:5]
        exp = np.array([[0.25, 0.3, 0.2, 0.2], [0.75, 0.65, 0.2, 0.2]])
        np.testing.assert_allclose(got, exp, atol=0.04)


def test_save_txt_without_hybrid_respects_conf(tiny_eval_setup, tmp_path):
    import jax.numpy as jnp

    plan, params, state, ds, _ = tiny_eval_setup
    loader = create_loader(ds, batch_size=4, shuffle=False, max_labels=8,
                           drop_last=False)
    out = tmp_path / "labels2"
    out.mkdir()
    evaluate(plan, params, state, loader, names=("a", "b", "c"),
             conf_thres=0.9, compute_dtype=jnp.float32,
             save_txt_dir=str(out), save_conf=False, save_hybrid=False)
    # random-init model: nothing reaches conf 0.9 -> no txts written
    # (the reference creates no file for zero detections)
    assert list(out.glob("*.txt")) == []
