"""Training driver — the train.py/train_aux.py loop (reference train.py:41-535).

Orchestrates: dataset/loader build, hyp scaling, mesh setup, warmup
schedule, jitted train steps, per-epoch EMA eval, checkpointing
(last/best/periodic), results logging. The aux-head path (train_aux.py)
is the same driver with an IAuxDetect cfg + aux OTA loss — selected
automatically from the model head.
"""

from __future__ import annotations

import dataclasses
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from yolo_series_tpu.data.datasets import DetectionDataset, create_loader
from yolo_series_tpu.losses import LossHyp, make_compute_loss, make_compute_loss_ota
from yolo_series_tpu.losses.aux_ota import make_compute_loss_aux_ota
from yolo_series_tpu.models.graph import compile_graph
from yolo_series_tpu.models.heads import IAuxDetect, IBin
from yolo_series_tpu.models.model import init_model
from yolo_series_tpu.eval.evaluator import evaluate
from yolo_series_tpu.eval.metrics import fitness
from yolo_series_tpu.obs.artifacts import ARTIFACT_PREFIX
from yolo_series_tpu.parallel.mesh import make_mesh, replicated
from yolo_series_tpu.train.checkpoints import (
    load_checkpoint, restore_train_state, save_checkpoint, strip_checkpoint,
)
from yolo_series_tpu.train.optim import OptimConfig
from yolo_series_tpu.train.schedules import warmup_accumulate, warmup_factors
from yolo_series_tpu.train.step import init_train_state, make_train_step

DEFAULT_TRAIN_HYP = {
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.3, "cls_pw": 1.0, "obj": 0.7, "obj_pw": 1.0,
    "iou_t": 0.2, "anchor_t": 4.0, "fl_gamma": 0.0,
    "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0,
    "translate": 0.2, "scale": 0.9, "shear": 0.0, "perspective": 0.0,
    "flipud": 0.0, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15,
    "copy_paste": 0.0, "paste_in": 0.15, "loss_ota": 1,
}


@dataclasses.dataclass
class TrainConfig:
    cfg: str                      # model yaml
    data: Optional[str] = None    # dataset yaml (train/val paths, nc, names)
    hyp: Optional[Any] = None     # hyp yaml path or dict
    epochs: int = 300
    batch_size: int = 16
    img_size: int = 640
    nominal_batch_size: int = 64  # grad-accumulation target (train.py:111)
    weights: str = ""             # initial weights ('' = scratch)
    resume: str = ""              # checkpoint to resume from
    save_dir: str = "runs/train/exp"
    adam: bool = False
    linear_lr: bool = False
    max_labels: int = 256
    eval_every: int = 1
    save_period: int = 25
    seed: int = 0
    n_data_devices: Optional[int] = None
    rect: bool = False
    compute_dtype: Any = jnp.bfloat16
    label_smoothing: float = 0.0
    noval: bool = False
    autoanchor: bool = True       # BPR check + kmeans/GA recompute (train.py:278)
    warmup_min_steps: int = 1000  # reference nw floor (train.py:300)
    multi_scale: bool = False     # bucketed ±50% device-side rescale
    # (5 gs-rounded buckets over the reference's uniform [0.5, 1.5]·imgsz
    # draw, train.py:360-365; see the sizes set below)
    multi_scale_full_range: bool = False  # reference distribution: ANY
    # gs multiple in [0.5, 1.5]·imgsz (one compiled step per size —
    # ~2x the buckets' compile count at 640; A/B lever, PARITY "multi-
    # scale bucketing")
    multi_scale_every: int = 1    # redraw cadence in optimizer steps
    # (reference redraws per BATCH, i.e. every step, train.py:360; its
    # de-facto cadence with nbs accumulation is every accumulate
    # micro-batches — set 10 to mimic a sticky per-10-batch draw)
    freeze: int = 0               # freeze first N layers (train.py:102)
    image_weights: bool = False   # class-weighted epoch resampling
    device_aug: bool = False      # warp/HSV/flip/mixup on-device
    cache_images: bool = False    # RAM-cache decoded images (train --cache)
    fast_decode: bool = False     # reduced-scale JPEG decode (documented
    # deviation: decoder-level downscale vs INTER_AREA; see datasets.py)
    workers: int = 1              # loader decode threads (reference
    # train.py --workers 8; cv2/numpy release the GIL)
    fast_stem: bool = True        # phase-folded stem in the train step
    # (SGD-equivalent weight reshuffle, models/faststem.make_train_fast_stem)
    split_concat: bool = False    # ELAN concat elimination in the train
    # step: conv1x1(concat) -> per-tap sliced matmuls (models/fastconcat.py;
    # exact identity, plan-only — checkpoints/eval keep the original plan).
    # Default OFF: serving A/B measured it NEGATIVE at P5/640 (900.3 ->
    # 798.3 img/s, tools/exp_split_concat.py); opt-in pending P6 evidence.
    quad: bool = False            # quad collate: 4 samples -> one 2x image
    # (reference collate_fn4 + loss*4 compensation, datasets.py:931/train.py:377)
    warmup_accumulate: bool = True  # ramp accumulate 1 -> nbs/bs during
    # warmup (train.py:352-353); one compiled step program per distinct value
    single_cls: bool = False      # treat data as one class (train.py:78-79)
    v5_metric: bool = False       # yolov5 AP convention in per-epoch and
    # final evals (train.py:438, 518: assume max recall 1.0)
    nosave: bool = False          # only save the final checkpoint
    # (train.py:464: save gated on `(not nosave) or final_epoch`)
    sync_bn: bool = True          # False: per-replica (unsynced) BN under a
    # multi-device mesh — the reference's DEFAULT multi-GPU semantics
    # (SyncBN is opt-in there, train.py:240-242); here sync is the default
    # (SURVEY §2.7: per-replica batch on TPU is small) and this is the
    # apples-to-apples opt-out
    entity: Optional[str] = None  # W&B entity (reference train.py --entity)
    upload_dataset: bool = False  # snapshot the dataset into the versioned
    # artifact store and train FROM the snapshot (reference
    # --upload_dataset; wandb_utils.py:193-218 rewrites the data yaml to
    # artifact paths and trains on those)
    bbox_interval: int = -1       # epochs between val bbox media panels
    # (reference --bbox_interval; wandb_utils.py:263-300). -1 = off
    artifact_alias: str = "latest"  # dataset-artifact alias used when
    # `data` is an artifact:// ref (reference --artifact_alias)


def _scaled_loss_hyp(hyp: dict, nl: int, nc: int, img_size: int,
                     label_smoothing: float = 0.0) -> LossHyp:
    """Reference hyp rescaling by layers/classes/image size
    (train.py:288-291)."""
    return LossHyp(
        box=hyp["box"] * 3.0 / nl,
        cls=hyp["cls"] * nc / 80.0 * 3.0 / nl,
        obj=hyp["obj"] * (img_size / 640.0) ** 2 * 3.0 / nl,
        cls_pw=hyp["cls_pw"], obj_pw=hyp["obj_pw"],
        anchor_t=hyp["anchor_t"], fl_gamma=hyp["fl_gamma"],
        label_smoothing=label_smoothing, gr=1.0)


def load_hyp(hyp) -> dict:
    if hyp is None:
        return dict(DEFAULT_TRAIN_HYP)
    if isinstance(hyp, dict):
        return dict(DEFAULT_TRAIN_HYP, **hyp)
    with open(hyp) as f:
        return dict(DEFAULT_TRAIN_HYP, **yaml.safe_load(f))


def train(tc: TrainConfig, train_ds: Optional[DetectionDataset] = None,
          val_ds: Optional[DetectionDataset] = None,
          callbacks: Optional[Dict[str, Any]] = None) -> Dict:
    """Run training; returns {best_fitness, results, save_dir}."""
    hyp = load_hyp(tc.hyp)
    save_dir = Path(tc.save_dir)
    (save_dir / "weights").mkdir(parents=True, exist_ok=True)
    with open(save_dir / "hyp.yaml", "w") as f:
        yaml.dump(hyp, f)
    with open(save_dir / "opt.yaml", "w") as f:  # resume re-reads this
        yaml.dump({k: v for k, v in dataclasses.asdict(tc).items()
                   if isinstance(v, (int, float, str, bool, type(None)))}, f)
    from yolo_series_tpu.obs.loggers import ExperimentLogger
    logger = ExperimentLogger(save_dir, entity=tc.entity)

    # dataset artifacts (reference wandb_utils.py:159-218): --upload_dataset
    # snapshots the dataset into the PROJECT-level versioned store and the
    # run trains from the snapshot's rewritten data.yaml; an artifact://
    # data ref resolves an existing snapshot at --artifact_alias
    data_path = tc.data
    if data_path and (tc.upload_dataset
                      or str(data_path).startswith(ARTIFACT_PREFIX)):
        from yolo_series_tpu.obs.artifacts import (
            ArtifactStore, download_dataset_artifact, log_dataset_artifact)
        store = ArtifactStore(Path(tc.save_dir).parent / "artifacts")
        if not str(data_path).startswith(ARTIFACT_PREFIX):
            vdir = log_dataset_artifact(store, data_path)
            data_path = str(vdir / "data.yaml")
            print(f"dataset artifact: {vdir} (training from the snapshot)")
        else:
            ref = str(data_path)
            if ":" not in ref[len(ARTIFACT_PREFIX):]:
                ref = f"{ref}:{tc.artifact_alias}"
            data_path = str(download_dataset_artifact(store, ref))
            print(f"dataset artifact resolved: {ref} -> {data_path}")

    data_cfg: dict = {}
    if data_path:
        with open(data_path) as f:
            data_cfg = yaml.safe_load(f)
    nc = 1 if tc.single_cls else int(data_cfg.get("nc", 80))
    names = data_cfg.get("names", [str(i) for i in range(nc)])
    if tc.single_cls and len(names) != 1:  # reference train.py:79
        names = ["item"]

    plan = compile_graph(tc.cfg, nc=nc)
    key = jax.random.PRNGKey(tc.seed)
    params, state = init_model(plan, key)

    if tc.weights:
        from yolo_series_tpu.train.checkpoints import load_checkpoint_any
        _, params_l, state_l = load_checkpoint_any(tc.weights, tc.cfg)
        # partial load (intersect_dicts equivalent): copy matching shapes
        def merge(dst, src):
            return jax.tree_util.tree_map(
                lambda d, s: s if d.shape == s.shape else d, dst, src)
        try:
            params = merge(params, params_l)
            state = merge(state, state_l)
        except ValueError:
            print("WARNING: weight tree mismatch; training from scratch")

    head = plan.head

    # -- dataset + autoanchor BEFORE the loss/step functions are built, so
    # recomputed anchors actually reach the jitted train step (the reference
    # runs check_anchors before training starts, train.py:278) --
    if train_ds is None:
        is_human = data_cfg.get("dataset") == "human"
        train_ds = DetectionDataset(
            data_cfg["train"], img_size=tc.img_size, batch_size=tc.batch_size,
            augment=True, hyp=hyp, rect=tc.rect, stride=int(max(head.strides)),
            kind="human" if is_human else "coco",
            odgt_paths=[p for p in
                        [data_cfg.get("crowd_human_train_label_file")] if p],
            xml_dir=data_cfg.get("safety_helmet_dataset_label_dir"),
            cut_max_len=int(data_cfg.get("cut_max_len", -1)),
            device_tail=tc.device_aug, cache_images=tc.cache_images,
            fast_decode=tc.fast_decode, single_cls=tc.single_cls)
    anchors_override = None
    if tc.autoanchor and not tc.resume:
        try:
            from yolo_series_tpu.utils.autoanchor import check_anchors
            apx = head.anchors_grid()
            bpr, new_anchors = check_anchors(
                train_ds.labels, train_ds.shapes, apx, head.strides,
                thr=hyp["anchor_t"], imgsz=tc.img_size)
            if new_anchors is not None:
                nl_, na_ = apx.shape[0], apx.shape[1]
                anchors_override = (
                    new_anchors.reshape(nl_, na_ * 2).round(2).tolist())
                plan = compile_graph(tc.cfg, nc=nc, anchors=anchors_override)
                head = plan.head
                print("autoanchor: anchors updated")
        except Exception as e:  # noqa: BLE001
            print(f"autoanchor skipped: {e}")

    nl = len(head.strides)
    # quad mode: images arrive at 2x side length (the label->pixel decode
    # inside the loss must use the REAL image size); the reference scales
    # hyp gains by the base imgsz regardless of --quad (train.py:288-291)
    loss_hyp = _scaled_loss_hyp(hyp, nl, nc, tc.img_size, tc.label_smoothing)
    is_aux = isinstance(head, IAuxDetect)
    if is_aux:
        loss_fn = make_compute_loss_aux_ota(head, loss_hyp)
    elif isinstance(head, IBin):
        # the reference ships ComputeLossBinOTA (loss.py:848-1172) but never
        # dispatches to it from train.py; here an IBin cfg trains directly
        if not hyp.get("loss_ota", 1):
            print("IBin head: loss_ota=0 ignored — ComputeLossBinOTA is the "
                  "only bin-capable loss (the non-OTA ComputeLoss would "
                  "misread IBin's binned w/h channel layout)")
        from yolo_series_tpu.losses.bin_ota import make_compute_loss_bin_ota
        loss_fn = make_compute_loss_bin_ota(head, loss_hyp)
    elif hyp.get("loss_ota", 1):
        loss_fn = make_compute_loss_ota(head, loss_hyp)
    else:
        loss_fn = make_compute_loss(head, loss_hyp)

    # grad accumulation to the nominal batch (reference train.py:110-112):
    # `accumulate` micro-batches feed one optimizer step via in-graph
    # lax.scan; weight decay is scaled by the effective batch (train.py:112
    # uses the final accumulate, not the warmup-ramped one). During warmup
    # the reference ramps accumulate 1 -> nbs/bs (train.py:352-353); here
    # each distinct ramp value selects its own compiled step program
    # (<= nbs/bs compiles, all shape-static).
    accumulate = max(round(tc.nominal_batch_size / tc.batch_size), 1)
    opt_cfg = OptimConfig(kind="adam" if tc.adam else "sgd", lr0=hyp["lr0"],
                          momentum=hyp["momentum"],
                          weight_decay=hyp["weight_decay"] * tc.batch_size
                          * accumulate / tc.nominal_batch_size)

    n_dev = tc.n_data_devices or 1
    mesh = make_mesh(n_data=n_dev) if n_dev > 1 else None
    ts = init_train_state(params, state, opt_cfg)
    start_epoch = 0
    best_fitness = 0.0
    if tc.resume:
        resume_path = tc.resume
        if resume_path.startswith("artifact://"):
            # artifact-resume (reference wandb_utils.download_model_artifact,
            # :168-177) from the local versioned store
            from yolo_series_tpu.obs.artifacts import (
                ArtifactStore, download_model_artifact)
            store = ArtifactStore(Path(tc.save_dir) / "artifacts")
            resume_path, _meta = download_model_artifact(store, resume_path)
            resume_path = str(resume_path)
        blob = load_checkpoint(resume_path)
        ts = restore_train_state(blob, opt_cfg)
        start_epoch = blob["epoch"] + 1
        best_fitness = blob.get("best_fitness", 0.0)
        print(f"resumed from {resume_path} at epoch {start_epoch}")
    if mesh is not None:
        ts = jax.device_put(ts, replicated(mesh))

    # phase-folded stem for the TRAIN STEP only (models/faststem.py
    # make_train_fast_stem): same params/state trees, SGD-equivalent
    # gradients, ~full-lane layouts for the hi-res stem tensors (the
    # standard 640px x 32/64ch maps run at ~22% of HBM peak). Checkpoints,
    # eval and autoanchor keep the original plan.
    step_plan = plan
    if tc.fast_stem:
        from yolo_series_tpu.models.faststem import make_train_fast_stem
        step_plan = make_train_fast_stem(plan)
    if tc.split_concat:
        from yolo_series_tpu.models.fastconcat import make_split_concat
        step_plan = make_split_concat(step_plan)

    gs = int(max(head.strides))
    if tc.multi_scale:
        # size buckets over the reference's ±50% range (train.py:360-365
        # draws uniform [0.5, 1.5]·imgsz gs-rounded every batch — unbounded
        # shape churn XLA can't cache); 5 buckets, one compiled step each,
        # built lazily on first draw
        if tc.multi_scale_full_range:
            lo = int(round(tc.img_size * 0.5 / gs))
            hi = int(round(tc.img_size * 1.5 / gs))
            sizes = [s * gs for s in range(lo, hi + 1)]
        else:
            sizes = sorted({int(round(tc.img_size * s / gs)) * gs
                            for s in (0.5, 0.75, 1.0, 1.25, 1.5)})
        size_rng = np.random.default_rng(tc.seed + 777)
        ms_cur = {"size": None, "step": -1}
    step_cache: Dict[Any, Any] = {}

    def _get_step(accum: int, size: Optional[int] = None):
        key = (accum, size)
        if key not in step_cache:
            step_cache[key] = make_train_step(
                step_plan, loss_fn, opt_cfg, mesh=mesh, accumulate=accum,
                compute_dtype=tc.compute_dtype, freeze=tc.freeze,
                resize_to=size, loss_scale=4.0 if tc.quad else 1.0,
                bn_shards=(n_dev if (not tc.sync_bn and n_dev > 1) else 1))
        return step_cache[key]

    loader = create_loader(train_ds, batch_size=tc.batch_size,
                           max_labels=tc.max_labels, seed=tc.seed,
                           image_weights=tc.image_weights,
                           hold=accumulate, quad=tc.quad,
                           workers=tc.workers)
    nb = len(loader)
    warmup_steps = max(round(hyp["warmup_epochs"] * nb), tc.warmup_min_steps)

    if val_ds is None and not tc.noval and data_cfg.get("val"):
        # the reference always builds a testloader from data['val']
        # (train.py:430-437: rect, pad 0.5) — per-epoch eval and
        # best-fitness checkpoint selection must work from the CLI, not
        # only when a caller injects val_ds
        try:
            is_human = data_cfg.get("dataset") == "human"
            val_ds = DetectionDataset(
                data_cfg["val"], img_size=tc.img_size,
                batch_size=tc.batch_size, augment=False, rect=True, pad=0.5,
                stride=int(max(head.strides)),
                kind="human" if is_human else "coco",
                odgt_paths=[p for p in
                            [data_cfg.get("crowd_human_valid_label_file")]
                            if p],
                xml_dir=data_cfg.get("safety_helmet_dataset_label_dir"),
                cut_max_len=int(data_cfg.get("cut_max_len", -1)),
                single_cls=tc.single_cls)
        except Exception as e:
            # fail loudly: a typo'd val path or corrupt val labels would
            # otherwise silently disable per-epoch eval AND best-fitness
            # checkpoint selection for the whole run (the reference crashes
            # in create_dataloader, train.py:430)
            raise RuntimeError(
                f"failed to build the val dataset from data['val']="
                f"{data_cfg.get('val')!r} (fix the path or pass --noval): {e}"
            ) from e

    val_loader = None
    if val_ds is not None:
        val_loader = lambda: create_loader(  # noqa: E731
            val_ds, batch_size=tc.batch_size, shuffle=False,
            max_labels=tc.max_labels, drop_last=False)

    results_rows = []
    cfg_dict = yaml.safe_load(open(tc.cfg)) if isinstance(tc.cfg, str) else dict(tc.cfg)
    cfg_dict = {**cfg_dict, "nc": nc, "names": list(names)}  # checkpoint must
    # rebuild the plan exactly as trained (nc/names come from the data yaml)
    if anchors_override is not None:
        cfg_dict["anchors"] = anchors_override
    step = int(ts.step)
    ni = start_epoch * nb  # integrated-batch counter (reference `ni`,
    # train.py:345: ni = i + nb * epoch; resume restarts at the epoch head)
    dev_aug_fn = None  # built lazily when device-tail batches appear
    micro = []  # pending micro-batches; persists across epoch boundaries,
    # like the reference's global ni % accumulate cadence (train.py:384)
    for epoch in range(start_epoch, tc.epochs):
        t0 = time.time()
        mloss = None
        for batch in loader:
            micro.append(batch)
            ni += 1
            if ni <= 3 and "images" in batch:
                # first-3-batch mosaics (reference train.py:403-407:
                # train_batch{0,1,2}.jpg); the device-aug tail has no host
                # pixels to plot, so it is skipped there
                try:
                    from yolo_series_tpu.obs.plots import plot_images
                    plot_images(batch["images"], batch["labels"],
                                batch["label_mask"],
                                paths=batch.get("paths"), names=names,
                                fname=str(save_dir
                                          / f"train_batch{ni - 1}.jpg"))
                except Exception as e:  # noqa: BLE001
                    print(f"train batch plot failed: {e}")
            # warmup accumulate ramp (reference train.py:352-353): early
            # optimizer steps consume fewer micro-batches; the ramp value
            # picks which compiled step program runs
            accum_now = (warmup_accumulate(ni - 1, warmup_steps, accumulate)
                         if tc.warmup_accumulate else accumulate)
            if len(micro) < accum_now:
                continue
            acc = len(micro)
            epoch_frac = jnp.float32(epoch + 0.0)
            lr_groups, mom = warmup_factors(
                jnp.float32(ni - 1), warmup_steps, epoch_frac, tc.epochs,
                hyp["lr0"], hyp["lrf"], hyp["warmup_bias_lr"],
                hyp["warmup_momentum"], hyp["momentum"],
                cosine=not tc.linear_lr)
            # multi-scale engages AFTER warmup: during the accumulate ramp
            # the (acc, size) product would lazily compile up to
            # (nbs/bs)x5 distinct step programs (minutes each on this box);
            # post-warmup acc is fixed, so the cache holds <= nbs/bs + 5
            # programs total. Documented deviation: the reference rescales
            # from batch 0 (train.py:360) — warmup batches here train at
            # the base size only.
            ramping = tc.warmup_accumulate and acc < accumulate
            ms_size = None
            if tc.multi_scale and not ramping:
                ms_cur["step"] += 1
                if (ms_cur["size"] is None
                        or ms_cur["step"] % tc.multi_scale_every == 0):
                    ms_cur["size"] = sizes[size_rng.integers(len(sizes))]
                ms_size = ms_cur["size"]
            fn = _get_step(acc, ms_size)
            if "tiles" in micro[0] or "canvases" in micro[0]:
                # device-aug tail (data/device_aug.py): warp/HSV/flip/mixup
                # run on-device; output is already normalized float
                if dev_aug_fn is None:
                    from yolo_series_tpu.data.device_aug import \
                        make_device_augment
                    # default hyps have no rotation/shear/perspective -> the
                    # warp is separable scale+translate (matmul path, ~40x
                    # faster than the gather warp on TPU)
                    sep = (hyp.get("degrees", 0) == 0
                           and hyp.get("shear", 0) == 0
                           and hyp.get("perspective", 0) == 0)
                    dev_aug_fn = make_device_augment(
                        tc.img_size, 2 * tc.img_size, separable=sep,
                        mosaic="tiles" in micro[0])

                def _aug(b):
                    rest = (jnp.asarray(b["minv"]), jnp.asarray(b["hsv"]),
                            jnp.asarray(b["flips"]),
                            jnp.asarray(b["mix_idx"]), jnp.asarray(b["mix_w"]))
                    if "tiles" in b:  # device-side mosaic compose
                        return dev_aug_fn(
                            jnp.asarray(b["tiles"]), jnp.asarray(b["origins"]),
                            jnp.asarray(b["centers"]), *rest)
                    return dev_aug_fn(jnp.asarray(b["canvases"]), *rest)

                aug_imgs = [_aug(b) for b in micro]
                ims_dev = jnp.stack(aug_imgs) if acc > 1 else aug_imgs[0]
            else:
                if acc > 1:
                    ims = np.stack([b["images"] for b in micro])
                else:
                    ims = micro[0]["images"]
                # ship raw uint8; the step normalizes on device
                # (train/step.py loss_and_grad — 4x less H2D traffic)
                ims_dev = jnp.asarray(ims)
            if acc > 1:
                lbs = np.stack([b["labels"] for b in micro])
                mks = np.stack([b["label_mask"] for b in micro])
            else:
                lbs, mks = micro[0]["labels"], micro[0]["label_mask"]
            micro = []
            ts, metrics = fn(
                ts, ims_dev, jnp.asarray(lbs), jnp.asarray(mks),
                lr_groups, mom)
            step += 1
            m = {k: float(v) for k, v in metrics.items()}
            mloss = m if mloss is None else {
                k: (mloss[k] * 0.9 + 0.1 * v) for k, v in m.items()}
        row = {"epoch": epoch, **{f"train/{k}": v for k, v in (mloss or {}).items()},
               "time_s": time.time() - t0}

        fi = 0.0
        if val_loader is not None and not tc.noval and \
                (epoch % tc.eval_every == 0 or epoch == tc.epochs - 1):
            # --bbox_interval: val bbox media panels every N epochs
            # (reference wandb_utils.log_training_progress, :263-300)
            media = (tc.bbox_interval > 0
                     and (epoch % tc.bbox_interval == 0
                          or epoch == tc.epochs - 1))
            res = evaluate(plan, ts.ema_params, ts.ema_state, val_loader(),
                           names=names, v5_metric=tc.v5_metric,
                           plots_dir=str(save_dir) if media else None)
            if media:
                for f in sorted(save_dir.glob("test_batch*_pred.jpg")):
                    logger.log_image(f"val/{f.stem}", f, step=epoch)
            row.update({f"val/{k}": res[k] for k in
                        ("mp", "mr", "map50", "map")})
            fi = res["fitness"]
        best_fitness = max(best_fitness, fi)
        results_rows.append(row)

        ckpt_kw = dict(cfg=cfg_dict, epoch=epoch, best_fitness=best_fitness,
                       results=results_rows, hyp=hyp)
        # --nosave: only the final epoch writes a checkpoint (train.py:464)
        do_save = (not tc.nosave) or epoch == tc.epochs - 1
        if do_save:
            save_checkpoint(save_dir / "weights" / "last.ckpt", ts, **ckpt_kw)
        if do_save and fi > 0 and fi >= best_fitness:
            save_checkpoint(save_dir / "weights" / "best.ckpt", ts, **ckpt_kw)
            if epoch >= 200:  # late-best snapshots (train.py:478-479)
                save_checkpoint(save_dir / "weights" / f"best_{epoch:03d}.ckpt",
                                ts, **ckpt_kw)
        # epoch-stamped cadence (train.py:480-485): epoch 0, every
        # `save_period`th (default 25), and the final 5 epochs
        if do_save and (
                epoch == 0
                or (tc.save_period > 0 and (epoch + 1) % tc.save_period == 0)
                or epoch >= tc.epochs - 5):
            save_checkpoint(save_dir / "weights" / f"epoch_{epoch:03d}.ckpt",
                            ts, **ckpt_kw)
        print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" if isinstance(v, float)
                                            else f"{k}={v}" for k, v in row.items()))
        logger.log_scalars({k: v for k, v in row.items()
                            if isinstance(v, (int, float))}, step)
        if callbacks and "on_epoch_end" in callbacks:
            callbacks["on_epoch_end"](epoch, row, ts)

    try:
        from yolo_series_tpu.obs.plots import plot_results
        plot_results(results_rows, save_dir)
    except Exception as e:  # noqa: BLE001
        print(f"plot_results failed: {e}")

    # train-end finish steps (reference train.py:494-531): final eval of the
    # best checkpoint, then strip last/best to deploy form (ema -> params,
    # optimizer dropped, fp16 — strip_optimizer, general.py:820-833)
    final_results = None
    best_path = save_dir / "weights" / "best.ckpt"
    last_path = save_dir / "weights" / "last.ckpt"
    # best when it exists, else last — the reference evaluates whichever
    # final weights file is present (train.py:497: best if exists else last),
    # so --nosave runs (best never written) still get the final eval
    final_path = best_path if best_path.exists() else last_path
    if val_loader is not None and not tc.noval and final_path.exists():
        blob = load_checkpoint(final_path)
        final_results = evaluate(
            plan, blob.get("ema_params") or blob["params"],
            blob.get("ema_state") or blob["state"], val_loader(),
            names=names, verbose=True, v5_metric=tc.v5_metric)
        print(f"final {final_path.name}: "
              + " ".join(f"{k}={final_results[k]:.4f}"
                         for k in ("mp", "mr", "map50", "map")))
    for p in (last_path, best_path):
        if p.exists():
            strip_checkpoint(p)
    logger.finish()
    (save_dir / "DONE").write_text("ok")  # resume scanner marker
    return {"best_fitness": best_fitness, "results": results_rows,
            "final_results": final_results,
            "save_dir": str(save_dir), "train_state": ts, "plan": plan}
