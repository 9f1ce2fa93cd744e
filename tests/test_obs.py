"""Observability: local artifact store round-trip (wandb_utils.py:159-261
offline equivalent), evolve-scatter and keypoint-skeleton plots."""

import numpy as np
import pytest


def test_artifact_store_roundtrip(tmp_path):
    from yolo_series_tpu.obs.artifacts import ArtifactStore

    store = ArtifactStore(tmp_path / "store")
    f1 = tmp_path / "a.ckpt"
    f1.write_bytes(b"v1")
    v1 = store.log("run_x_model", [f1], metadata={"epochs_trained": 1},
                   aliases=("latest", "epoch0"))
    f1.write_bytes(b"v2")
    v2 = store.log("run_x_model", [f1], metadata={"epochs_trained": 2},
                   aliases=("latest", "best"))
    assert v1.name == "v0" and v2.name == "v1"

    d, meta = store.resolve("artifact://run_x_model")  # default latest
    assert d == v2 and meta["epochs_trained"] == 2
    d, _ = store.resolve("artifact://run_x_model:epoch0")
    assert d == v1
    d, _ = store.resolve("artifact://run_x_model:v0")
    assert d == v1
    assert (v2 / "a.ckpt").read_bytes() == b"v2"
    with pytest.raises(FileNotFoundError):
        store.resolve("artifact://missing:latest")


def test_model_artifact_resume_guard(tmp_path):
    from yolo_series_tpu.obs.artifacts import (
        ArtifactStore, download_model_artifact, log_model_artifact)

    store = ArtifactStore(tmp_path / "store")
    ck = tmp_path / "last.ckpt"
    ck.write_bytes(b"ckpt")
    log_model_artifact(store, ck, run_id="r1", epoch=4, total_epochs=10,
                       fitness_score=0.5)
    path, meta = download_model_artifact(store, "artifact://run_r1_model")
    assert path.read_bytes() == b"ckpt"
    assert meta["fitness_score"] == 0.5

    # finished run refuses to resume (wandb_utils.py:174-176)
    log_model_artifact(store, ck, run_id="r2", epoch=9, total_epochs=10,
                       fitness_score=0.9)
    with pytest.raises(RuntimeError):
        download_model_artifact(store, "artifact://run_r2_model")


def test_dataset_artifact_roundtrip(tmp_path):
    import cv2
    import yaml

    from yolo_series_tpu.obs.artifacts import (
        ArtifactStore, download_dataset_artifact, log_dataset_artifact)

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    files = []
    for i in range(3):
        p = tmp_path / "images" / f"im{i}.jpg"
        cv2.imwrite(str(p), np.full((40, 40, 3), 90, np.uint8))
        (tmp_path / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.2 0.2")
        files.append(str(p))
    (tmp_path / "train.txt").write_text("\n".join(files[:2]))
    (tmp_path / "val.txt").write_text(files[2])
    dy = tmp_path / "data.yaml"
    yaml.safe_dump({"train": str(tmp_path / "train.txt"),
                    "val": str(tmp_path / "val.txt"),
                    "nc": 1, "names": ["thing"]}, open(dy, "w"))

    store = ArtifactStore(tmp_path / "store")
    vdir = log_dataset_artifact(store, dy, name="toyset")
    y = download_dataset_artifact(store, "artifact://toyset")
    data = yaml.safe_load(open(y))
    train_list = open(data["train"]).read().strip().splitlines()
    assert len(train_list) == 2
    # images AND labels copied into the artifact
    assert all((vdir / "data" / "images" / f"im{i}.jpg").exists()
               for i in range(3))
    assert all((vdir / "data" / "labels" / f"im{i}.txt").exists()
               for i in range(3))
    # the rewritten lists point INSIDE the artifact
    assert all(str(vdir) in p for p in train_list)


def test_experiment_logger_local_artifact(tmp_path):
    from yolo_series_tpu.obs.loggers import ExperimentLogger

    lg = ExperimentLogger(tmp_path / "run", use_tb=False, use_wandb=False)
    ck = tmp_path / "best.ckpt"
    ck.write_bytes(b"x")
    vdir = lg.log_model_artifact(ck, name="m", metadata={"epoch": 1})
    assert (vdir / "best.ckpt").exists()
    lg.finish()


def test_plot_evolution(tmp_path):
    from yolo_series_tpu.obs.plots import plot_evolution
    from yolo_series_tpu.train.evolve import EVOLVE_META, append_result

    txt = tmp_path / "evolve.txt"
    rng = np.random.default_rng(0)
    for i in range(6):
        hyp = {k: float(rng.uniform(lo, hi))
               for k, (_, lo, hi) in EVOLVE_META.items()}
        append_result(txt, [0.5, 0.5, 0.3 + 0.05 * i, 0.2 + 0.05 * i], hyp)
    out = plot_evolution(txt, save_dir=tmp_path)
    assert out.exists() and out.stat().st_size > 10_000


def test_plot_skeleton_kpts():
    from yolo_series_tpu.obs.plots import plot_skeleton_kpts

    im = np.zeros((200, 200, 3), np.uint8)
    rng = np.random.default_rng(1)
    kpts = []
    for _ in range(17):
        kpts += [float(rng.uniform(20, 180)), float(rng.uniform(20, 180)), 0.9]
    out = plot_skeleton_kpts(im, np.asarray(kpts), steps=3)
    assert out.sum() > 0  # circles + limbs drawn
    # low-confidence kpts are skipped entirely
    im2 = np.zeros((200, 200, 3), np.uint8)
    kpts_low = np.asarray(kpts)
    kpts_low[2::3] = 0.1
    out2 = plot_skeleton_kpts(im2, kpts_low, steps=3)
    assert out2.sum() == 0
