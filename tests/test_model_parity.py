"""Numerical parity of the JAX model vs the reference PyTorch model.

Builds the reference Model from the same architecture on CPU with random
init, imports its state_dict through torch_import, and compares decoded
inference outputs element-for-element. This is the strongest available
golden test absent pretrained weights (SURVEY.md §4a).
"""

import numpy as np
import pytest

from tests.ref_oracle import has_reference, load_reference, ref_state_dict_numpy

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo unavailable")

CFGS = {
    "deploy/yolov7-tiny": "cfg/deploy/yolov7-tiny.yaml",
    "deploy/yolov7": "cfg/deploy/yolov7.yaml",  # the serving/bench graph
    "training/yolov7-tiny": "cfg/training/yolov7-tiny.yaml",
    "training/yolov7": "cfg/training/yolov7.yaml",
    # P6 path: ReOrg stem, DownC, IAuxDetect (lead-only decode at eval)
    "training/yolov7-w6": "cfg/training/yolov7-w6.yaml",
    # width/depth-scaled P5 (the 1.25x/1.0x gains exercise make_divisible)
    "training/yolov7x": "cfg/training/yolov7x.yaml",
    # E-ELAN (doubled-tap aggregation) + DownC at e6e scale
    "training/yolov7-e6e": "cfg/training/yolov7-e6e.yaml",
    "training/yolov7-e6": "cfg/training/yolov7-e6.yaml",
    "training/yolov7-d6": "cfg/training/yolov7-d6.yaml",
    # baseline family (VERDICT r1 item 3): Bottleneck/CSPB/CSPC + plain
    # Detect (yolov4-csp) and IDetect (yolor-csp) paths
    "baseline/yolor-csp": "cfg/baseline/yolor-csp.yaml",
    "baseline/yolov4-csp": "cfg/baseline/yolov4-csp.yaml",
    # ResNet/ResNeXt bottleneck family
    "baseline/r50-csp": "cfg/baseline/r50-csp.yaml",
    "baseline/x50-csp": "cfg/baseline/x50-csp.yaml",
    # remaining inventory (round 3): every shipped cfg oracle-verified
    "baseline/yolor-csp-x": "cfg/baseline/yolor-csp-x.yaml",
    "baseline/yolor-p6": "cfg/baseline/yolor-p6.yaml",
    "baseline/yolor-w6": "cfg/baseline/yolor-w6.yaml",
    "baseline/yolor-e6": "cfg/baseline/yolor-e6.yaml",
    "baseline/yolor-d6": "cfg/baseline/yolor-d6.yaml",
    "baseline/yolov3": "cfg/baseline/yolov3.yaml",
    "baseline/yolov3-spp": "cfg/baseline/yolov3-spp.yaml",
    "deploy/yolov7-tiny-silu": "cfg/deploy/yolov7-tiny-silu.yaml",
    "deploy/yolov7x": "cfg/deploy/yolov7x.yaml",
    "deploy/yolov7-w6": "cfg/deploy/yolov7-w6.yaml",
    "deploy/yolov7-e6": "cfg/deploy/yolov7-e6.yaml",
    "deploy/yolov7-d6": "cfg/deploy/yolov7-d6.yaml",
    "deploy/yolov7-e6e": "cfg/deploy/yolov7-e6e.yaml",
    "training/yolov7-custom": "cfg/training/yolov7-custom.yaml",
    "training/yolov7-w6-custom": "cfg/training/yolov7-w6-custom.yaml",
}


def _build_pair(name, img=256, seed=0):
    import torch

    import jax.numpy as jnp
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.model import apply_model
    from yolo_series_tpu.models.torch_import import import_state_dict

    import yaml

    with open(f"yolo_series_tpu/models/cfg/{name}.yaml") as f:
        nc = int(yaml.safe_load(f).get("nc", 80))  # custom cfgs use nc=83

    ref = load_reference()
    torch.manual_seed(seed)
    ref_model = ref["Model"](f"/root/reference/{CFGS[name]}", ch=3,
                             nc=nc).float().eval()

    plan = compile_graph(f"yolo_series_tpu/models/cfg/{name}.yaml")
    params, state = import_state_dict(plan, ref_state_dict_numpy(ref_model))

    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (1, 3, img, img)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x))

    out, _ = apply_model(plan, params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         training=False)
    return ref_model, plan, ref_out, out


@pytest.mark.parametrize("name", list(CFGS))
def test_inference_parity(name):
    ref_model, plan, ref_out, out = _build_pair(name)
    ref_pred = ref_out[0].numpy()          # (1, A, 85) decoded
    got_pred = np.asarray(out["pred"])
    assert got_pred.shape == ref_pred.shape
    # boxes in pixels: atol 1e-2; probabilities: atol 1e-5
    np.testing.assert_allclose(got_pred[..., :4], ref_pred[..., :4], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got_pred[..., 4:], ref_pred[..., 4:], rtol=1e-4, atol=1e-5)


def test_training_raw_parity():
    import torch

    import jax.numpy as jnp
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.model import apply_model
    from yolo_series_tpu.models.torch_import import import_state_dict

    ref = load_reference()
    torch.manual_seed(1)
    ref_model = ref["Model"]("/root/reference/cfg/training/yolov7-tiny.yaml",
                             ch=3, nc=80).float()
    ref_model.eval()  # eval-mode BN so running stats are used in both
    # but keep the head in "training output" mode:
    ref_model.model[-1].training = True

    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    params, state = import_state_dict(plan, ref_state_dict_numpy(ref_model))

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 3, 192, 192)).astype(np.float32)
    with torch.no_grad():
        ref_raw = ref_model(torch.from_numpy(x))

    # our training=True would flip BN to batch stats; emulate the same
    # split (BN eval + head train) by running inference and re-using raw.
    out, _ = apply_model(plan, params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         training=False)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out["raw"][i]), ref_raw[i].numpy(), rtol=1e-4, atol=1e-4)


def test_param_count_matches_reference():
    import torch

    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.model import init_model
    import jax

    ref = load_reference()
    torch.manual_seed(0)
    ref_model = ref["Model"]("/root/reference/cfg/training/yolov7.yaml", ch=3, nc=80)
    ref_n = sum(p.numel() for p in ref_model.parameters())

    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7.yaml")
    params, _ = init_model(plan, jax.random.PRNGKey(0))
    mine = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert mine == ref_n, f"{mine} vs reference {ref_n}"


def test_tta_augmented_forward_parity():
    """TTA (scales x flips + de-scale/de-flip, yolo.py:581-599) vs the
    reference's forward(augment=True)."""
    import torch

    import jax.numpy as jnp
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.torch_import import import_state_dict
    from yolo_series_tpu.models.tta import apply_model_tta

    ref = load_reference()
    torch.manual_seed(0)
    ref_model = ref["Model"]("/root/reference/cfg/deploy/yolov7-tiny.yaml",
                             ch=3, nc=80).float().eval()
    plan = compile_graph("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = import_state_dict(plan, ref_state_dict_numpy(ref_model))

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 3, 192, 192)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x), augment=True)[0].numpy()
    got = np.asarray(apply_model_tta(plan, params, state,
                                     jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got[..., :4], want[..., :4], rtol=1e-3,
                               atol=5e-2)
    np.testing.assert_allclose(got[..., 4:], want[..., 4:], rtol=1e-3,
                               atol=1e-4)


def _retargeted_pair(head_torch, head_mine, nc, extra_args=(), seed=0,
                     img=192):
    """Build ref + mine from yolov7-tiny with the head swapped."""
    import torch
    import yaml

    import jax.numpy as jnp
    from yolo_series_tpu.models.graph import compile_graph
    from yolo_series_tpu.models.model import apply_model
    from yolo_series_tpu.models.torch_import import import_state_dict

    ref = load_reference()
    with open("/root/reference/cfg/training/yolov7-tiny.yaml") as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["head"][-1][2] = head_torch
    ref_cfg["head"][-1][3] = ["nc", "anchors", *extra_args]
    torch.manual_seed(seed)
    ref_model = ref["Model"](ref_cfg, ch=3, nc=nc).float().eval()

    with open("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml") as f:
        my_cfg = yaml.safe_load(f)
    my_cfg["head"][-1][2] = head_mine
    my_cfg["head"][-1][3] = ["nc", "anchors", *extra_args]
    my_cfg["nc"] = nc
    plan = compile_graph(my_cfg)
    params, state = import_state_dict(plan, ref_state_dict_numpy(ref_model))

    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (1, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x))
    out, _ = apply_model(plan, params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)), training=False)
    return ref_out, out


def test_ikeypoint_full_model_parity():
    """IKeypoint decode incl. the reference's channel-concat layout quirk
    (yolo.py:257-260) and raw-logit keypoint x/y decode (:278-280)."""
    ref_out, out = _retargeted_pair("IKeypoint", "ikeypoint", nc=1,
                                    extra_args=(17,))
    want = ref_out[0].numpy()
    got = np.asarray(out["pred"])
    assert got.shape == want.shape  # (1, A, 6 + 51)
    np.testing.assert_allclose(got[..., :4], want[..., :4], rtol=1e-4,
                               atol=1e-2)
    np.testing.assert_allclose(got[..., 4:6], want[..., 4:6], rtol=1e-4,
                               atol=1e-5)
    # keypoints: xy in pixels, visibility sigmoid
    np.testing.assert_allclose(got[..., 6:], want[..., 6:], rtol=1e-4,
                               atol=1e-2)


def test_ibin_full_model_parity():
    """IBin inference decode (argmax-bin + residual w/h, yolo.py:460-505)."""
    ref_out, out = _retargeted_pair("IBin", "ibin", nc=80)
    want = ref_out[0].numpy()
    got = np.asarray(out["pred"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got[..., :4], want[..., :4], rtol=1e-4,
                               atol=1e-2)
    np.testing.assert_allclose(got[..., 4:], want[..., 4:], rtol=1e-4,
                               atol=1e-5)


def test_classify_block_parity():
    """Classify head (common.py:1015-1025): pool + conv + flatten."""
    import torch

    import jax
    import jax.numpy as jnp
    from yolo_series_tpu.models.extra import Classify
    from yolo_series_tpu.models.layers import Ctx
    from yolo_series_tpu.models.torch_import import _SD, import_block

    load_reference()
    from models.common import Classify as TClassify

    torch.manual_seed(0)
    tc = TClassify(32, 10).float().eval()
    sd = _SD({f"blk.{k}": v.detach().float().numpy()
              for k, v in tc.state_dict().items()})
    blk = Classify(32, 10)
    params, state = import_block(blk, sd, "blk")
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tc(torch.from_numpy(x)).numpy()
    got, _ = blk.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       Ctx(training=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["training/yolov7", "training/yolov7-w6"])
def test_torch_export_roundtrip_parity(name):
    """INVERSE bridge (models/torch_export.py): a model initialized HERE,
    exported into the reference torch Model, must decode identically —
    the interop a reference user migrating their training needs. Covers
    the IDetect (yolov7) and IAuxDetect/P6 (w6) head exports."""
    import torch

    import jax
    import jax.numpy as jnp
    from yolo_series_tpu.models.model import Model as JModel, apply_model
    from yolo_series_tpu.models.torch_export import load_into_reference_model

    ref = load_reference()
    m = JModel.from_yaml(f"yolo_series_tpu/models/cfg/{name}.yaml",
                         key=jax.random.PRNGKey(3))
    ref_model = ref["Model"](f"/root/reference/{CFGS[name]}",
                             ch=3, nc=80).float().eval()
    load_into_reference_model(ref_model, m.plan, m.params, m.state)

    img = 256
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        ref_pred = ref_model(torch.from_numpy(x))[0].numpy()
    out, _ = apply_model(m.plan, m.params, m.state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)), training=False)
    got = np.asarray(out["pred"])
    assert got.shape == ref_pred.shape
    np.testing.assert_allclose(got[..., :4], ref_pred[..., :4],
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got[..., 4:], ref_pred[..., 4:],
                               rtol=1e-4, atol=1e-5)
