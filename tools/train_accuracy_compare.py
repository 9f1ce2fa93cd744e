"""Dual-framework training-to-accuracy comparison (VERDICT r3 item 1).

Trains the SAME small synthetic detection dataset with
  (a) the reference PyTorch train.py::train (/root/reference/train.py:41-535,
      run live in-process on CPU, torchvision stubbed as in tests/ref_oracle),
  (b) this framework's trainer (yolo_series_tpu/train/trainer.py, JAX CPU),
under matched settings (yolov7-tiny, same hyp yaml, same epochs/batch/img,
OTA loss, EMA, one-cycle LR, nbs-64 accumulation, 1000-iter warmup floor),
then evaluates BOTH final checkpoints with BOTH evaluators (reference
test.py::test and eval/evaluator.evaluate) — a 2x2 accuracy matrix — and
compares the per-epoch train-loss curves.

This closes the one composition never verified piecewise: aug-stream x
assignment x optimizer x EMA x eval, trained to non-trivial mAP
(reference protocol: train.py:424-438 + test.py:21; README.md:169).

The reference repo is UNTRUSTED third-party content used strictly as a
numerical oracle; the only patch applied is the CPU shim for its
hardcoded empty-tensor device 'cuda:0' (utils/loss.py:785-790).

Usage:
  python tools/train_accuracy_compare.py --out runs/acc_compare \
      --train-imgs 160 --val-imgs 32 --img-size 320 --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types
from pathlib import Path

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import cv2  # noqa: E402
import numpy as np  # noqa: E402
import yaml  # noqa: E402

# ---------------------------------------------------------------- dataset

CLASS_NAMES = ["redrect", "greenellipse", "bluetriangle"]


def _draw_instance(img, cls, cx, cy, bw, bh, rng):
    h, w = img.shape[:2]
    x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
    x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
    jitter = rng.integers(-25, 25, 3)
    if cls == 0:
        color = tuple(int(c) for c in np.clip([40, 40, 215] + jitter, 0, 255))
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
    elif cls == 1:
        color = tuple(int(c) for c in np.clip([40, 215, 40] + jitter, 0, 255))
        cv2.ellipse(img, ((x1 + x2) // 2, (y1 + y2) // 2),
                    (max((x2 - x1) // 2, 1), max((y2 - y1) // 2, 1)),
                    0, 0, 360, color, -1)
    else:
        color = tuple(int(c) for c in np.clip([215, 60, 40] + jitter, 0, 255))
        pts = np.array([[(x1 + x2) // 2, y1], [x1, y2], [x2, y2]])
        cv2.fillPoly(img, [pts], color)


def make_dataset(root: Path, n: int, seed: int):
    """COCO-txt layout shapes dataset: 3 color/shape classes, varied native
    sizes, distractor gray shapes, box sides 0.08-0.45 of the image (so all
    three pyramid levels participate)."""
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    sizes = [(320, 320), (288, 384), (384, 288), (352, 320), (320, 416)]
    for i in range(n):
        h, w = sizes[int(rng.integers(0, len(sizes)))]
        img = rng.integers(50, 110, (h, w, 3)).astype(np.uint8)
        # unlabeled gray distractors
        for _ in range(int(rng.integers(1, 4))):
            g = int(rng.integers(70, 150))
            dx, dy = int(rng.uniform(0, w * 0.85)), int(rng.uniform(0, h * 0.85))
            dw, dh = int(rng.uniform(8, w * 0.15)), int(rng.uniform(8, h * 0.15))
            cv2.rectangle(img, (dx, dy), (dx + dw, dy + dh), (g, g, g), -1)
        rows = []
        for _ in range(int(rng.integers(1, 5))):
            cls = int(rng.integers(0, 3))
            bw = float(rng.uniform(0.08, 0.45))
            bh = float(bw * rng.uniform(0.7, 1.4))
            bh = min(bh, 0.45)
            cx = float(rng.uniform(bw / 2 + 0.02, 0.98 - bw / 2))
            cy = float(rng.uniform(bh / 2 + 0.02, 0.98 - bh / 2))
            _draw_instance(img, cls, cx, cy, bw, bh, rng)
            rows.append(f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text("\n".join(rows))


AUXLITE_ANCHORS = [
    [13, 16, 19, 24, 27, 34],        # P3/8
    [38, 48, 48, 38, 58, 71],        # P4/16
    [77, 96, 96, 77, 115, 125],      # P5/32
    [137, 166, 168, 134, 200, 240],  # P6/64
]


def write_auxlite_cfg(path: Path, nc: int = 3):
    """A scaled-down ReOrg+IAuxDetect P6 config in the reference cfg DSL
    (both frameworks parse it). Mirrors yolov7-w6.yaml's topology —
    ReOrg stem, 4-level backbone, SPPCSPC + top-down/bottom-up FPN, lead
    heads off the bottom-up path and aux heads off the top-down path
    (reference cfg/training/yolov7-w6.yaml:162, train_aux.py:306) — at
    ~1/8 the channels and 2-deep ELANs so the find_5_positive / 0.25-aux
    composition can be trained to mAP on CPU."""

    def elan(c_mid, c_out):
        return [
            [-1, 1, "Conv", [c_mid, 1, 1]],
            [-2, 1, "Conv", [c_mid, 1, 1]],
            [-1, 1, "Conv", [c_mid, 3, 1]],
            [-1, 1, "Conv", [c_mid, 3, 1]],
            [[-1, -2, -3, -4], 1, "Concat", [1]],
            [-1, 1, "Conv", [c_out, 1, 1]],
        ]

    backbone = [
        [-1, 1, "ReOrg", []],            # 0   /2
        [-1, 1, "Conv", [16, 3, 1]],     # 1
        [-1, 1, "Conv", [32, 3, 2]],     # 2   /4
        *elan(16, 32),                   # 3-8
        [-1, 1, "Conv", [64, 3, 2]],     # 9   /8
        *elan(32, 64),                   # 10-15 (P3 = 15)
        [-1, 1, "Conv", [128, 3, 2]],    # 16  /16
        *elan(64, 128),                  # 17-22 (P4 = 22)
        [-1, 1, "Conv", [192, 3, 2]],    # 23  /32
        *elan(96, 192),                  # 24-29 (P5 = 29)
        [-1, 1, "Conv", [256, 3, 2]],    # 30  /64
        *elan(128, 256),                 # 31-36 (P6 = 36)
    ]
    head = [
        [-1, 1, "SPPCSPC", [128]],                       # 37
        [-1, 1, "Conv", [96, 1, 1]],                     # 38
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],    # 39
        [29, 1, "Conv", [96, 1, 1]],                     # 40
        [[-1, -2], 1, "Concat", [1]],                    # 41
        *elan(48, 96),                                   # 42-47 (P5 td = 47)
        [-1, 1, "Conv", [64, 1, 1]],                     # 48
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],    # 49
        [22, 1, "Conv", [64, 1, 1]],                     # 50
        [[-1, -2], 1, "Concat", [1]],                    # 51
        *elan(32, 64),                                   # 52-57 (P4 td = 57)
        [-1, 1, "Conv", [32, 1, 1]],                     # 58
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],    # 59
        [15, 1, "Conv", [32, 1, 1]],                     # 60
        [[-1, -2], 1, "Concat", [1]],                    # 61
        *elan(16, 32),                                   # 62-67 (P3 td = 67)
        [-1, 1, "Conv", [64, 3, 2]],                     # 68  /16
        [[-1, 57], 1, "Concat", [1]],                    # 69
        *elan(32, 64),                                   # 70-75 (P4 bu = 75)
        [-1, 1, "Conv", [96, 3, 2]],                     # 76  /32
        [[-1, 47], 1, "Concat", [1]],                    # 77
        *elan(48, 96),                                   # 78-83 (P5 bu = 83)
        [-1, 1, "Conv", [128, 3, 2]],                    # 84  /64
        [[-1, 37], 1, "Concat", [1]],                    # 85
        *elan(64, 128),                                  # 86-91 (P6 bu = 91)
        # lead heads (bottom-up path), like w6's 114-117
        [67, 1, "Conv", [64, 3, 1]],                     # 92
        [75, 1, "Conv", [128, 3, 1]],                    # 93
        [83, 1, "Conv", [192, 3, 1]],                    # 94
        [91, 1, "Conv", [256, 3, 1]],                    # 95
        # aux heads (top-down path), like w6's 118-121
        [67, 1, "Conv", [80, 3, 1]],                     # 96
        [57, 1, "Conv", [160, 3, 1]],                    # 97
        [47, 1, "Conv", [240, 3, 1]],                    # 98
        [37, 1, "Conv", [320, 3, 1]],                    # 99
        [[92, 93, 94, 95, 96, 97, 98, 99], 1, "IAuxDetect",
         ["nc", "anchors"]],                             # 100
    ]
    cfg = {"nc": nc, "depth_multiple": 1.0, "width_multiple": 1.0,
           "anchors": AUXLITE_ANCHORS, "backbone": backbone, "head": head}
    path.write_text(yaml.dump(cfg, sort_keys=False, default_flow_style=None))


def make_hyp(path: Path):
    """Matched hyp: reference hyp.scratch.tiny.yaml with mixup/paste_in off
    (both frameworks read this same file)."""
    hyp = yaml.safe_load(
        Path("/root/reference/data/hyp.scratch.tiny.yaml").read_text())
    hyp["mixup"] = 0.0
    hyp["paste_in"] = 0.0
    hyp["copy_paste"] = 0.0
    hyp["loss_ota"] = 1
    path.write_text(yaml.dump(hyp, sort_keys=False))
    return hyp


# ------------------------------------------------------------- reference

def _shim_torch_load():
    """torch>=2.6 flipped torch.load's weights_only default to True; the
    reference pickles whole modules (train.py:465-472) and numpy-bearing
    label caches (datasets.py:811) and re-loads its own files
    (general.py:822, datasets.py:411). Every such file is produced
    in-process by this tool."""
    import torch

    if not getattr(torch.load, "_acc_compare_shim", False):
        _orig_load = torch.load

        def _load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _load._acc_compare_shim = True
        torch.load = _load


def run_reference(data_yaml: Path, hyp_yaml: Path, out: Path, epochs: int,
                  batch_size: int, img_size: int, seed: int = 0,
                  cfg: str = "/root/reference/cfg/training/yolov7-tiny.yaml",
                  train_script: str = "/root/reference/train.py") -> dict:
    """Run reference train.py::train (or train_aux.py::train for aux-head
    configs, reference train_aux.py:33,306) live on CPU. Returns
    loss-curve rows."""
    from ref_oracle import load_reference
    load_reference()  # stubs torchvision, puts /root/reference on sys.path

    import torch

    _shim_torch_load()

    # CPU shim for the reference's hardcoded empty-level fallback device
    # (utils/loss.py:785-790, 1112-1117).
    import utils.loss as ref_loss
    src = Path("/root/reference/utils/loss.py").read_text()
    src = src.replace("device='cuda:0'", "device='cpu'")
    exec(compile(src, "/root/reference/utils/loss.py", "exec"),
         ref_loss.__dict__)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_train_module", train_script)
    ref_train = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_train)

    if seed:
        # Reference hardcodes init_seeds(2 + rank) (train.py:62); offset it
        # per-run so init + aug RNG streams vary while the dataset is fixed.
        _orig_init_seeds = ref_train.init_seeds
        ref_train.init_seeds = lambda s: _orig_init_seeds(s + 1000 * seed)

    hyp = yaml.safe_load(hyp_yaml.read_text())
    opt = types.SimpleNamespace(
        weights="", cfg=cfg,
        data=str(data_yaml), hyp=str(hyp_yaml), epochs=epochs,
        batch_size=batch_size, total_batch_size=batch_size,
        img_size=[img_size, img_size], rect=False, resume=False,
        nosave=False, notest=True, noautoanchor=True, evolve=False,
        bucket="", cache_images=False, image_weights=False, device="cpu",
        multi_scale=False, single_cls=False, adam=False, sync_bn=False,
        local_rank=-1, workers=0, project=str(out), entity=None,
        name="ref", exist_ok=True, quad=False, linear_lr=False,
        label_smoothing=0.0, upload_dataset=False, bbox_interval=-1,
        save_period=-1, artifact_alias="latest", freeze=[0],
        v5_metric=False, world_size=1, global_rank=-1,
        save_dir=str(out / "ref"))
    device = torch.device("cpu")
    t0 = time.time()
    ref_train.train(hyp, opt, device, tb_writer=None)
    wall = time.time() - t0

    # results.txt columns: epoch mem box obj cls total labels img_size + 7
    rows = []
    for line in (out / "ref" / "results.txt").read_text().splitlines():
        f = line.split()
        if len(f) >= 6:
            rows.append({"epoch": f[0], "box": float(f[2]), "obj": float(f[3]),
                         "cls": float(f[4]), "total": float(f[5])})
    return {"loss_rows": rows, "wall_s": wall,
            "ckpt": str(out / "ref" / "weights" / "last.pt")}


# ------------------------------------------------------------------ ours

def run_ours(data_yaml: Path, hyp_yaml: Path, out: Path, epochs: int,
             batch_size: int, img_size: int, seed: int = 0,
             cfg: str = "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
             ) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolo_series_tpu.train.trainer import TrainConfig, train

    tc = TrainConfig(
        cfg=cfg,
        data=str(data_yaml), hyp=str(hyp_yaml), epochs=epochs,
        batch_size=batch_size, img_size=img_size,
        save_dir=str(out / "ours"), compute_dtype=jnp.float32,
        max_labels=64, noval=True, save_period=-1, autoanchor=False,
        nominal_batch_size=64, workers=1, seed=seed)
    t0 = time.time()
    res = train(tc)
    wall = time.time() - t0
    rows = [{"epoch": i, "box": r.get("train/box", float("nan")),
             "obj": r.get("train/obj", float("nan")),
             "cls": r.get("train/cls", float("nan")),
             "total": r["train/total"]}
            for i, r in enumerate(res["results"])]
    return {"loss_rows": rows, "wall_s": wall,
            "ckpt": str(out / "ours" / "weights" / "last.ckpt")}


# ------------------------------------------------------------------ eval

def _load_plans(ref_ckpt: str, our_ckpt: str, nc: int,
                cfg: str = "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml"):
    """Both checkpoints as (plan, params, state) in THIS framework."""
    from ref_oracle import load_reference
    load_reference()  # reference ckpts pickle whole modules; unpickling
    # needs /root/reference's `models`/`utils` packages importable
    _shim_torch_load()

    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.torch_import import load_torch_checkpoint
    from yolo_series_tpu.train.checkpoints import load_checkpoint_any

    plan_ref = compile_graph(cfg, nc=nc)
    p_ref, s_ref = load_torch_checkpoint(ref_ckpt, plan_ref, prefer_ema=True)
    plan_our, p_our, s_our = load_checkpoint_any(our_ckpt)
    return (plan_ref, p_ref, s_ref), (plan_our, p_our, s_our)


def _our_eval(plan, params, state, val_images: str, img_size, batch_size,
              names, stride=32):
    from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
    from yolo_series_tpu.eval.evaluator import evaluate

    ds = DetectionDataset(val_images, img_size=img_size,
                          batch_size=batch_size, augment=False, rect=True,
                          stride=stride, pad=0.5)
    loader = create_loader(ds, batch_size=batch_size, shuffle=False,
                           max_labels=64, drop_last=False)
    r = evaluate(plan, params, state, loader, names=names)
    return {k: float(r[k]) for k in ("mp", "mr", "map50", "map")}


def _ref_eval(plan, params, state, val_images: str, img_size, batch_size,
              names, cfg="/root/reference/cfg/training/yolov7-tiny.yaml",
              stride=32):
    """Reference test.py::test on a model exported into the reference
    torch Model (models/torch_export.py), as in
    tests/test_eval_protocol_parity.py."""
    import importlib.util

    import torch

    from ref_oracle import load_reference
    from yolo_series_tpu.models.torch_export import load_into_reference_model

    R = load_reference()
    torch.manual_seed(0)
    nc = len(names)
    ref_model = R["Model"](cfg, ch=3, nc=nc).float().eval()
    load_into_reference_model(ref_model, plan, params, state)
    ref_model.names = list(names)

    from utils.datasets import create_dataloader

    opt = types.SimpleNamespace(single_cls=False)
    dataloader = create_dataloader(
        "Test", val_images, img_size, batch_size, stride, opt, pad=0.5,
        rect=True, workers=0, data_dict={})[0]
    spec = importlib.util.spec_from_file_location(
        "ref_test_module", "/root/reference/test.py")
    ref_test = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_test)
    data = {"nc": nc, "names": list(names), "val": val_images}
    import tempfile
    with torch.no_grad():
        results, _, _ = ref_test.test(
            data, batch_size=batch_size, imgsz=img_size, conf_thres=0.001,
            iou_thres=0.65, save_json=False, model=ref_model,
            dataloader=dataloader,
            save_dir=Path(tempfile.mkdtemp()), plots=False,
            half_precision=False, is_coco=False)
    mp, mr, map50, mmap = (float(v) for v in results[:4])
    return {"mp": mp, "mr": mr, "map50": map50, "map": mmap}


# ------------------------------------------------------------------ main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/acc_compare")
    ap.add_argument("--train-imgs", type=int, default=160)
    ap.add_argument("--val-imgs", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--phase", default="all",
                    choices=["all", "data", "ref", "ours", "eval"])
    ap.add_argument("--seed", type=int, default=0,
                    help="init/aug seed offset for BOTH frameworks "
                         "(dataset generation stays fixed)")
    ap.add_argument("--model", default="tiny", choices=["tiny", "auxlite"],
                    help="tiny = yolov7-tiny via reference train.py; "
                         "auxlite = scaled-down ReOrg+IAuxDetect P6 cfg via "
                         "reference train_aux.py (aux-OTA composition)")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.model == "auxlite":
        aux_cfg = out / "auxlite.yaml"
        if not aux_cfg.exists():
            write_auxlite_cfg(aux_cfg)
        ref_cfg = our_cfg = str(aux_cfg)
        train_script = "/root/reference/train_aux.py"
        stride = 64
    else:
        ref_cfg = "/root/reference/cfg/training/yolov7-tiny.yaml"
        our_cfg = "yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml"
        train_script = "/root/reference/train.py"
        stride = 32
    data_root = out / "data"
    data_yaml = out / "data.yaml"
    hyp_yaml = out / "hyp.yaml"
    state_path = out / "compare.json"
    st = json.loads(state_path.read_text()) if state_path.exists() else {}

    if args.phase in ("all", "data"):
        make_dataset(data_root / "train", args.train_imgs, seed=1234)
        make_dataset(data_root / "val", args.val_imgs, seed=9876)
        data_yaml.write_text(yaml.dump({
            "train": str(data_root / "train" / "images"),
            "val": str(data_root / "val" / "images"),
            "nc": 3, "names": CLASS_NAMES}))
        make_hyp(hyp_yaml)
        st["config"] = vars(args).copy()
        state_path.write_text(json.dumps(st, indent=1))
        print("[data] generated", args.train_imgs, "+", args.val_imgs)

    if args.phase in ("all", "ref"):
        print("[ref] training reference torch on CPU ...")
        st["ref"] = run_reference(data_yaml, hyp_yaml, out, args.epochs,
                                  args.batch_size, args.img_size,
                                  seed=args.seed, cfg=ref_cfg,
                                  train_script=train_script)
        state_path.write_text(json.dumps(st, indent=1))
        print(f"[ref] done in {st['ref']['wall_s']:.0f}s")

    if args.phase in ("all", "ours"):
        print("[ours] training yolo_series_tpu on JAX CPU ...")
        st["ours"] = run_ours(data_yaml, hyp_yaml, out, args.epochs,
                              args.batch_size, args.img_size,
                              seed=args.seed, cfg=our_cfg)
        state_path.write_text(json.dumps(st, indent=1))
        print(f"[ours] done in {st['ours']['wall_s']:.0f}s")

    if args.phase in ("all", "eval"):
        val_images = str(data_root / "val" / "images")
        (plan_r, p_r, s_r), (plan_o, p_o, s_o) = _load_plans(
            st["ref"]["ckpt"], st["ours"]["ckpt"], nc=3, cfg=our_cfg)
        matrix = {}
        for ck_name, (plan, p, s) in (("ref_ckpt", (plan_r, p_r, s_r)),
                                      ("our_ckpt", (plan_o, p_o, s_o))):
            matrix[f"{ck_name}/our_eval"] = _our_eval(
                plan, p, s, val_images, args.img_size, args.batch_size,
                CLASS_NAMES, stride=stride)
            matrix[f"{ck_name}/ref_eval"] = _ref_eval(
                plan, p, s, val_images, args.img_size, args.batch_size,
                CLASS_NAMES, cfg=ref_cfg, stride=stride)
        st["matrix"] = matrix
        state_path.write_text(json.dumps(st, indent=1))
        print(f"\n{'':22s} {'mp':>8s} {'mr':>8s} {'map50':>8s} {'map':>8s}")
        for k, v in matrix.items():
            print(f"{k:22s} {v['mp']:8.4f} {v['mr']:8.4f} "
                  f"{v['map50']:8.4f} {v['map']:8.4f}")
        d50 = abs(matrix["ref_ckpt/ref_eval"]["map50"]
                  - matrix["our_ckpt/our_eval"]["map50"])
        dm = abs(matrix["ref_ckpt/ref_eval"]["map"]
                 - matrix["our_ckpt/our_eval"]["map"])
        print(f"\ncross-framework |d map50|={d50:.4f} |d map|={dm:.4f}")


if __name__ == "__main__":
    main()
