"""Golden tests: vectorized ComputeLoss vs the reference implementation."""

import numpy as np
import pytest

from tests.ref_oracle import has_reference, load_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo unavailable")


HYP = {
    "box": 0.05, "obj": 0.7, "cls": 0.3, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "fl_gamma": 0.0, "iou_t": 0.2,
}


def _make_ref_model(cfg="cfg/training/yolov7-tiny.yaml"):
    import torch

    ref = load_reference()
    torch.manual_seed(0)
    model = ref["Model"](f"/root/reference/{cfg}", ch=3, nc=80).float()
    model.hyp = dict(HYP)
    model.gr = 1.0
    return model


def _random_case(seed, bs=2, nt=12, img=256, nc=80, spread=True):
    """Random raw maps + targets. Targets are spread out to avoid duplicate
    cell assignments (where write-order between impls may differ)."""
    rng = np.random.default_rng(seed)
    strides = [8, 16, 32]
    na, no = 3, nc + 5
    raw = [rng.normal(0, 1.0, (bs, na, img // s, img // s, no)).astype(np.float32)
           for s in strides]
    # targets (n, 6): [img_idx, cls, x, y, w, h] normalized
    n = nt
    grid_pts = np.stack(np.meshgrid(np.linspace(0.15, 0.85, 4),
                                    np.linspace(0.15, 0.85, 4)), -1).reshape(-1, 2)
    sel = rng.permutation(len(grid_pts))[:n]
    xy = grid_pts[sel] + rng.uniform(-0.02, 0.02, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    img_idx = rng.integers(0, bs, n)
    cls = rng.integers(0, nc, n)
    targets = np.concatenate(
        [img_idx[:, None], cls[:, None], xy, wh], 1).astype(np.float32)
    return raw, targets


def _to_padded(targets, bs, m=32):
    labels = np.zeros((bs, m, 5), np.float32)
    mask = np.zeros((bs, m), bool)
    for b in range(bs):
        rows = targets[targets[:, 0] == b][:, 1:6]
        labels[b, :len(rows)] = rows
        mask[b, :len(rows)] = True
    return labels, mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compute_loss_matches_reference(seed):
    import torch

    import jax.numpy as jnp
    from yolo_series_tpu.losses import LossHyp, make_compute_loss

    model = _make_ref_model()
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss import ComputeLoss as RefComputeLoss

    ref_loss = RefComputeLoss(model)

    raw, targets = _random_case(seed)
    bs = raw[0].shape[0]

    with torch.no_grad():
        ref_total, ref_items = ref_loss(
            [torch.from_numpy(r) for r in raw], torch.from_numpy(targets))

    head = None
    from yolo_series_tpu.models.graph import compile_graph
    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    head = plan.head

    labels, mask = _to_padded(targets, bs)
    loss_fn = make_compute_loss(head, LossHyp())
    total, items = loss_fn([jnp.asarray(r) for r in raw],
                           jnp.asarray(labels), jnp.asarray(mask))

    np.testing.assert_allclose(float(items["box"]), float(ref_items[0]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(items["obj"]), float(ref_items[1]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(items["cls"]), float(ref_items[2]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("seed,rtol", [(s, 1e-3) for s in range(7)])
def test_compute_loss_ota_matches_reference(seed, rtol):
    import torch

    import jax.numpy as jnp
    from yolo_series_tpu.losses import LossHyp, make_compute_loss_ota
    from yolo_series_tpu.models.graph import compile_graph

    model = _make_ref_model()
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss import ComputeLossOTA as RefOTA

    ref_loss = RefOTA(model)

    img = 256
    raw, targets = _random_case(seed, img=img)
    bs = raw[0].shape[0]
    imgs = torch.zeros((bs, 3, img, img))

    with torch.no_grad():
        ref_total, ref_items = ref_loss(
            [torch.from_numpy(r) for r in raw], torch.from_numpy(targets), imgs)

    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    labels, mask = _to_padded(targets, bs)
    loss_fn = make_compute_loss_ota(plan.head, LossHyp())
    total, items = loss_fn([jnp.asarray(r) for r in raw],
                           jnp.asarray(labels), jnp.asarray(mask))

    np.testing.assert_allclose(float(items["box"]), float(ref_items[0]),
                               rtol=rtol, atol=1e-5)
    np.testing.assert_allclose(float(items["obj"]), float(ref_items[1]),
                               rtol=rtol, atol=1e-5)
    np.testing.assert_allclose(float(items["cls"]), float(ref_items[2]),
                               rtol=rtol, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_compute_loss_bin_ota_matches_reference(seed):
    """Golden for ComputeLossBinOTA (loss.py:848-1172): no reference cfg
    ships an IBin head, so retarget yolov7-tiny's head to IBin in both
    frameworks and compare on random maps."""
    import torch
    import yaml

    import jax.numpy as jnp
    from yolo_series_tpu.losses import LossHyp
    from yolo_series_tpu.losses.bin_ota import make_compute_loss_bin_ota
    from yolo_series_tpu.models.graph import compile_graph

    ref = load_reference()
    with open("/root/reference/cfg/training/yolov7-tiny.yaml") as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["head"][-1][2] = "IBin"
    torch.manual_seed(0)
    model = ref["Model"](ref_cfg, ch=3, nc=80).float()
    model.hyp = dict(HYP)
    model.gr = 1.0
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss import ComputeLossBinOTA as RefBin

    ref_loss = RefBin(model)

    with open("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml") as f:
        my_cfg = yaml.safe_load(f)
    my_cfg["head"][-1][2] = "ibin"
    plan = compile_graph(my_cfg)

    img = 256
    rng = np.random.default_rng(seed)
    strides = [8, 16, 32]
    no = plan.head.no  # nc + 3 + 2*(bin_count+1)
    raw = [rng.normal(0, 1.0, (2, 3, img // s, img // s, no)).astype(np.float32)
           for s in strides]
    _, targets = _random_case(seed, img=img)
    bs = 2
    imgs = torch.zeros((bs, 3, img, img))

    with torch.no_grad():
        ref_total, ref_items = ref_loss(
            [torch.from_numpy(r) for r in raw], torch.from_numpy(targets), imgs)

    labels, mask = _to_padded(targets, bs)
    loss_fn = make_compute_loss_bin_ota(plan.head, LossHyp())
    total, items = loss_fn([jnp.asarray(r) for r in raw],
                           jnp.asarray(labels), jnp.asarray(mask))

    np.testing.assert_allclose(float(items["box"]), float(ref_items[0]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(items["obj"]), float(ref_items[1]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(items["cls"]), float(ref_items[2]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-3,
                               atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_compute_loss_aux_ota_matches_reference(seed):
    import torch

    import jax.numpy as jnp
    from yolo_series_tpu.losses import LossHyp
    from yolo_series_tpu.losses.aux_ota import make_compute_loss_aux_ota
    from yolo_series_tpu.models.graph import compile_graph

    model = _make_ref_model()
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss import ComputeLossAuxOTA as RefAux

    ref_loss = RefAux(model)

    img = 256
    raw_lead, targets = _random_case(seed, img=img)
    rng = np.random.default_rng(seed + 100)
    raw_aux = [rng.normal(0, 1.0, r.shape).astype(np.float32) for r in raw_lead]
    raw = raw_lead + raw_aux
    bs = raw[0].shape[0]
    imgs = torch.zeros((bs, 3, img, img))

    with torch.no_grad():
        ref_total, ref_items = ref_loss(
            [torch.from_numpy(r) for r in raw], torch.from_numpy(targets), imgs)

    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    labels, mask = _to_padded(targets, bs)
    loss_fn = make_compute_loss_aux_ota(plan.head, LossHyp())
    total, items = loss_fn([jnp.asarray(r) for r in raw],
                           jnp.asarray(labels), jnp.asarray(mask))

    np.testing.assert_allclose(float(items["box"]), float(ref_items[0]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(items["obj"]), float(ref_items[1]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(items["cls"]), float(ref_items[2]),
                               rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_compute_loss_aux_ota_nl4_matches_reference(seed, tmp_path):
    """4-level (P3-P6) aux OTA golden — the 3-level test above cannot see
    nl=4-only behavior: balance [4.0, 1.0, 0.25, 0.06] (reference
    loss.py:1204), stride-64 grids, and the 4-level find_5/3_positive
    offsets. Uses the same scaled-down ReOrg+IAuxDetect cfg the
    dual-framework aux accuracy compare trains
    (tools/train_accuracy_compare.write_auxlite_cfg)."""
    import torch

    import jax.numpy as jnp
    from tools.train_accuracy_compare import write_auxlite_cfg
    from yolo_series_tpu.losses import LossHyp
    from yolo_series_tpu.losses.aux_ota import make_compute_loss_aux_ota
    from yolo_series_tpu.models.graph import compile_graph

    nc = 3
    cfg = tmp_path / "auxlite.yaml"
    write_auxlite_cfg(cfg, nc=nc)

    ref = load_reference()
    torch.manual_seed(0)
    model = ref["Model"](str(cfg), ch=3, nc=nc).float()
    model.hyp = dict(HYP)
    model.gr = 1.0
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss import ComputeLossAuxOTA as RefAux

    ref_loss = RefAux(model)

    img = 256
    strides = [8, 16, 32, 64]
    rng = np.random.default_rng(seed)
    bs, na, no = 2, 3, nc + 5
    raw_lead = [rng.normal(0, 1.0, (bs, na, img // s, img // s, no))
                .astype(np.float32) for s in strides]
    raw_aux = [rng.normal(0, 1.0, r.shape).astype(np.float32)
               for r in raw_lead]
    _, targets = _random_case(seed, bs=bs, img=img, nc=nc)
    raw = raw_lead + raw_aux
    imgs = torch.zeros((bs, 3, img, img))

    with torch.no_grad():
        ref_total, ref_items = ref_loss(
            [torch.from_numpy(r) for r in raw], torch.from_numpy(targets),
            imgs)

    plan = compile_graph(str(cfg))
    assert len(plan.head.strides) == 4, plan.head.strides
    labels, mask = _to_padded(targets, bs)
    loss_fn = make_compute_loss_aux_ota(plan.head, LossHyp())
    total, items = loss_fn([jnp.asarray(r) for r in raw],
                           jnp.asarray(labels), jnp.asarray(mask))

    np.testing.assert_allclose(float(items["box"]), float(ref_items[0]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(items["obj"]), float(ref_items[1]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(items["cls"]), float(ref_items[2]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-3,
                               atol=1e-5)
