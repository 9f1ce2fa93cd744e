"""Hyperparameter-evolution GA end-to-end (reference train.py:630-716).

VERDICT r3 item 5: the evolve driver had never been executed. This runs
two real generations (train -> eval -> evolve.txt append -> mutate) on a
tiny dataset and checks the reference's GA contract: evolve.txt rows are
[P, R, mAP50, mAP, 28 hyp values], mutations stay inside the meta-table
bounds (train.py:636-666), the best hyp is selected by fitness
(metrics.py:12-15), and plot_evolution renders (plots.py:321)."""

from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_shapes(tmp_path_factory):
    root = tmp_path_factory.mktemp("evoshapes")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(5)
    for i in range(8):
        img = rng.integers(40, 90, (160, 160, 3)).astype(np.uint8)
        bw, bh = rng.uniform(0.3, 0.5, 2)
        cx = float(rng.uniform(bw / 2 + 0.05, 0.95 - bw / 2))
        cy = float(rng.uniform(bh / 2 + 0.05, 0.95 - bh / 2))
        x1, y1 = int((cx - bw / 2) * 160), int((cy - bh / 2) * 160)
        x2, y2 = int((cx + bw / 2) * 160), int((cy + bh / 2) * 160)
        cv2.rectangle(img, (x1, y1), (x2, y2), (40, 40, 230), -1)
        cv2.imwrite(str(root / "images" / f"im{i}.jpg"), img)
        (root / "labels" / f"im{i}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
    return root


def test_evolve_two_generations(tiny_shapes, tmp_path):
    import jax.numpy as jnp

    from yolo_series_tpu.train.evolve import EVOLVE_META, evolve
    from yolo_series_tpu.train.trainer import TrainConfig, load_hyp

    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(yaml.dump({
        "train": str(tiny_shapes / "images"),
        "val": str(tiny_shapes / "images"),
        "nc": 1, "names": ["box"]}))
    hyp = {"mosaic": 0.0, "mixup": 0.0, "paste_in": 0.0,
           "warmup_bias_lr": 0.01}
    tc = TrainConfig(
        cfg="yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
        data=str(data_yaml), hyp=hyp, epochs=2, batch_size=8,
        img_size=160, save_dir=str(tmp_path / "evo"),
        compute_dtype=jnp.float32, max_labels=8, eval_every=1,
        save_period=-1, warmup_min_steps=2, nominal_batch_size=8,
        autoanchor=False)
    best = evolve(tc, generations=2)
    assert best is not None

    # evolve.txt: one row per generation, [4 metrics + 28 hyp values]
    evolve_txt = tmp_path / "evo" / "evolve.txt"
    assert evolve_txt.exists()
    x = np.loadtxt(evolve_txt, ndmin=2)
    assert x.shape == (2, 4 + len(EVOLVE_META)), x.shape
    assert np.all(np.isfinite(x))

    # mutated values clipped to the meta-table bounds (train.py:690-693)
    keys = list(EVOLVE_META.keys())
    for row in x:
        for i, k in enumerate(keys):
            _, lo, hi = EVOLVE_META[k]
            assert lo - 1e-9 <= row[4 + i] <= hi + 1e-9, (k, row[4 + i])

    # generation 1 mutated from generation 0's row: the GA must actually
    # change at least one hyp (mutate() loops until v != all-ones)
    assert not np.allclose(x[0, 4:], x[1, 4:]), "gen 1 identical to gen 0"

    # hyp_evolved.yaml holds the best generation's hyp by fitness
    from yolo_series_tpu.eval.metrics import fitness
    evolved = yaml.safe_load((tmp_path / "evo" / "hyp_evolved.yaml").read_text())
    full = load_hyp(evolved)
    best_row = x[np.argmax(fitness(x))]
    for i, k in enumerate(keys):
        # evolve.txt stores %.5g (reference train.py print_mutation
        # '%10.5g'), so the roundtrip quantizes to 5 significant digits —
        # compare at that resolution, not bit-exactly (mutations are
        # rng-driven, so a 6-sig-digit draw like 2.85266 -> "2.8527" is
        # routine)
        tol = max(1e-6, 1e-4 * abs(full[k]))
        assert abs(full[k] - best_row[4 + i]) < tol, (k, full[k])

    # each generation trained for real: per-gen run dirs with checkpoints
    for gen in range(2):
        assert (tmp_path / "evo" / f"gen{gen:03d}" / "weights"
                / "last.ckpt").exists()

    # plot_evolution renders the scatter panels over the result
    from yolo_series_tpu.obs.plots import plot_evolution
    plot_evolution(evolve_txt, save_dir=str(tmp_path / "evo"))
    pngs = list(Path(tmp_path / "evo").glob("evolve*.png"))
    assert pngs, "plot_evolution produced no image"
