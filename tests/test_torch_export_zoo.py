"""torch_export inverse-mapping coverage for the exotic zoo (VERDICT r3
weak #8: Swin/OREPA/Robust/Transformer raised NotImplementedError, which
silently limited reference-side cross-eval to the yolov7 family).

Contract per block: torch -> import_block -> export_block must reproduce
the ORIGINAL torch state_dict bit-for-bit (fixed shape-derived buffers
excluded — the instantiated reference module already holds them)."""

import numpy as np
import pytest

from tests.ref_oracle import has_reference, load_reference
from tests.test_zoo_golden import _prefixed

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo unavailable")

_FIXED = ("num_batches_tracked", "relative_position_index",
          "relative_coords_table", "weight_rbr_avg_avg",
          "weight_rbr_prior", "id_tensor")


def _roundtrip(make_ref, my_block, shape, seed=0):
    import torch

    load_reference()
    from yolo_series_tpu.models.torch_export import export_block
    from yolo_series_tpu.models.torch_import import _SD, import_block

    torch.manual_seed(seed)
    ref = make_ref().float()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    rng = np.random.default_rng(seed)
    ref.train()
    with torch.no_grad():  # non-trivial BN running stats
        for _ in range(2):
            ref(torch.from_numpy(rng.normal(0, 1, shape).astype(np.float32)))
    ref.eval()

    sd_orig = {k: v.detach().float().numpy()
               for k, v in ref.state_dict().items()}
    params, state = import_block(my_block, _SD(dict(sd_orig)), "blk")

    out = {}
    export_block(my_block, out, "blk", params, state)
    for k, v in sd_orig.items():
        if k.endswith(_FIXED):
            continue
        assert k in out, f"export missing torch key {k}"
        np.testing.assert_allclose(np.asarray(out[k], np.float32), v,
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    extras = sorted(set(out) - set(sd_orig))
    assert not extras, f"export produced keys torch doesn't have: {extras}"


def test_export_robustconv():
    load_reference()
    import models.common as C

    from yolo_series_tpu.models.extra import RobustConv
    _roundtrip(lambda: _prefixed(C.RobustConv, 16, 32, k=7),
               RobustConv(16, 32, 7, 1), (2, 16, 16, 16))


def test_export_robustconv2():
    load_reference()
    import models.common as C

    from yolo_series_tpu.models.extra import RobustConv2
    _roundtrip(lambda: _prefixed(C.RobustConv2, 16, 32, k=7, s=4),
               RobustConv2(16, 32, 7, 4), (2, 16, 16, 16))


def test_export_orepa3x3():
    load_reference()
    import models.common as C

    from yolo_series_tpu.models.extra import OREPA3x3
    _roundtrip(lambda: _prefixed(C.OREPA_3x3_RepConv, 16, 16, 3,
                                 stride=1, padding=1),
               OREPA3x3(16, 16, 3, 1), (2, 16, 16, 16))


def test_export_repconv_orepa():
    load_reference()
    import models.common as C

    from yolo_series_tpu.models.extra import RepConvOREPA
    _roundtrip(lambda: _prefixed(C.RepConv_OREPA, 16, 16, 3),
               RepConvOREPA(16, 16, 3, 1), (2, 16, 16, 16))


@pytest.mark.parametrize("v2", [False, True])
def test_export_swin_block(v2):
    load_reference()
    import models.common as C

    from yolo_series_tpu.models.attention import SwinTransformerBlock
    tcls = C.SwinTransformer2Block if v2 else C.SwinTransformerBlock
    ws = 7 if v2 else 8
    _roundtrip(lambda: _prefixed(tcls, 16, 32, 2, 2),
               SwinTransformerBlock(16, 32, 2, 2, window_size=ws, v2=v2),
               (2, 16, 16, 16))


def test_export_transformer_block():
    load_reference()
    import models.common as C

    from yolo_series_tpu.models.attention import TransformerBlock
    _roundtrip(lambda: _prefixed(C.TransformerBlock, 16, 32, 2, 2),
               TransformerBlock(16, 32, 2, 2), (2, 16, 8, 8))


@pytest.mark.parametrize("v2", [False, True])
def test_export_stcsp_composite(v2):
    """STCSP composites route through export_block's Composite branch with
    the `m`-naming quirk (_child_torch_name) — the whole CSP+Swin stack
    must roundtrip."""
    load_reference()
    import models.common as C

    import yolo_series_tpu.models.attention as ATT
    tcls = getattr(C, f"ST{'2' if v2 else ''}CSPB")
    mycls = getattr(ATT, f"ST{'2' if v2 else ''}CSPB")
    _roundtrip(lambda: _prefixed(tcls, 64, 64, 1),
               mycls(64, 64, 1), (1, 64, 14, 14))
