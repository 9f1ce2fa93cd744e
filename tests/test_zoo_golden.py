"""Per-block golden parity for the long-tail zoo vs the reference torch
classes, instantiated directly from /root/reference as numerical oracles
(VERDICT r1 item 3: shape tests can't catch shift-mask/einsum/bias errors).

Each case: build the torch block, randomize BN stats by running train-mode
forwards, export state_dict, import through torch_import.import_block, and
compare eval-mode outputs element-for-element on CPU fp32.
"""

import numpy as np
import pytest

from tests.ref_oracle import has_reference, load_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo unavailable")


def _golden(make_ref, my_block, shape, seed=0, warm=True, atol=1e-4, rtol=1e-4,
            extra_unused=()):
    """Build ref block + mine, import weights, compare forward outputs."""
    import torch

    load_reference()
    import jax.numpy as jnp
    from yolo_series_tpu.models.layers import Ctx
    from yolo_series_tpu.models.torch_import import _SD, import_block

    torch.manual_seed(seed)
    ref = make_ref().float()
    # every reference block lives inside Model, which applies
    # initialize_weights (torch_utils.py:144-153: BN eps=1e-3, momentum=.03)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    rng = np.random.default_rng(seed)
    if warm:  # populate BN running stats with non-trivial values
        ref.train()
        with torch.no_grad():
            for _ in range(3):
                ref(torch.from_numpy(
                    rng.normal(0, 1, shape).astype(np.float32)))
    ref.eval()

    sd = _SD({k: v.detach().float().numpy()
              for k, v in ref.state_dict().items()})
    params, state = import_block(my_block, sd, "blk")
    unused = [k for k in sd.unused() if not any(t in k for t in extra_unused)]
    assert not unused, f"unimported torch keys: {unused}"

    x = rng.uniform(-1, 1, shape).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = my_block.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            Ctx(training=False))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return params, state, ref


def _prefixed(cls, *a, **k):
    """Wrap a reference module so its state_dict keys start with 'blk.'."""
    import torch

    class Holder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.blk = cls(*a, **k)

        def forward(self, x):
            return self.blk(x)

    return Holder()


# -- conv zoo ---------------------------------------------------------------


def test_robustconv_golden():
    load_reference()
    from models.common import RobustConv as TRobustConv
    from yolo_series_tpu.models.extra import RobustConv

    _golden(lambda: _prefixed(TRobustConv, 16, 32, k=7),
            RobustConv(16, 32, 7, 1), (2, 16, 16, 16))


def test_robustconv2_golden():
    load_reference()
    from models.common import RobustConv2 as TRobustConv2
    from yolo_series_tpu.models.extra import RobustConv2

    _golden(lambda: _prefixed(TRobustConv2, 16, 32, k=7, s=4),
            RobustConv2(16, 32, 7, 4), (2, 16, 16, 16))


@pytest.mark.parametrize("c2,s,shortcut", [(16, 1, True), (32, 2, False)])
def test_crossconv_golden(c2, s, shortcut):
    load_reference()
    from models.experimental import CrossConv as TCrossConv
    from yolo_series_tpu.models.extra import CrossConv

    _golden(lambda: _prefixed(TCrossConv, 16, c2, 3, s, 1, 1.0, shortcut),
            CrossConv(16, c2, 3, s, 1, 1.0, shortcut), (2, 16, 16, 16))


def test_mixconv2d_golden():
    load_reference()
    from models.experimental import MixConv2d as TMixConv2d
    from yolo_series_tpu.models.extra import MixConv2d

    _golden(lambda: _prefixed(TMixConv2d, 16, 16, (1, 3), 1),
            MixConv2d(16, 16, (1, 3), 1), (2, 16, 16, 16))


def test_ghost_sppcspc_and_stem_golden():
    load_reference()
    from models.common import GhostSPPCSPC as TG, GhostStem as TS
    from yolo_series_tpu.models.extra import GhostSPPCSPC, GhostStem

    _golden(lambda: _prefixed(TG, 32, 32),
            GhostSPPCSPC(32, 32), (2, 32, 16, 16))
    _golden(lambda: _prefixed(TS, 3, 32, 1, 1),
            GhostStem(3, 32, 1, 1), (2, 3, 32, 32))


# -- OREPA ------------------------------------------------------------------


@pytest.mark.parametrize("c2,s", [(16, 1), (32, 2)])
def test_orepa_3x3_golden(c2, s):
    load_reference()
    from models.common import OREPA_3x3_RepConv as TOREPA
    from yolo_series_tpu.models.extra import OREPA3x3

    _golden(lambda: _prefixed(TOREPA, 16, c2, 3, stride=s, padding=1),
            OREPA3x3(16, c2, 3, s), (2, 16, 16, 16))


@pytest.mark.parametrize("c2,s", [(16, 1), (32, 2)])
def test_repconv_orepa_golden(c2, s):
    import torch

    load_reference()
    import jax.numpy as jnp
    from models.common import RepConv_OREPA as TRC
    from yolo_series_tpu.models.extra import RepConvOREPA
    from yolo_series_tpu.models.layers import Ctx

    blk = RepConvOREPA(16, c2, 3, s)
    params, state, ref = _golden(
        lambda: _prefixed(TRC, 16, c2, 3, s), blk, (2, 16, 16, 16))

    # deploy parity: reference switch_to_deploy vs my deploy(), same input
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 16, 16, 16)).astype(np.float32)
    ref.blk.switch_to_deploy()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    dp, ds = blk.deploy(params, state)
    got, _ = blk.apply(dp, ds, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       Ctx(training=False))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


# -- attention zoo ----------------------------------------------------------


@pytest.mark.parametrize("v2", [False, True])
@pytest.mark.parametrize("c1,hw", [(32, (16, 16)), (16, (10, 14))])
def test_swin_block_golden(v2, c1, hw):
    """2 alternating layers (W-MSA + SW-MSA) incl. the optional channel conv
    and non-divisible padding; v2 = cosine attention + CPB MLP."""
    load_reference()
    from models.common import SwinTransformerBlock as TB1
    from models.common import SwinTransformer2Block as TB2
    from yolo_series_tpu.models.attention import SwinTransformerBlock

    ws = 7 if v2 else 8
    tcls = TB2 if v2 else TB1
    _golden(lambda: _prefixed(tcls, c1, 32, 2, 2),
            SwinTransformerBlock(c1, 32, 2, 2, window_size=ws, v2=v2),
            (2, c1) + hw, atol=2e-4)


@pytest.mark.parametrize("v2", [False, True])
@pytest.mark.parametrize("kind", ["A", "B", "C"])
def test_stcsp_golden(v2, kind):
    load_reference()
    import models.common as C
    import yolo_series_tpu.models.attention as ATT

    tcls = getattr(C, f"ST{'2' if v2 else ''}CSP{kind}")
    mycls = getattr(ATT, f"ST{'2' if v2 else ''}CSP{kind}")
    _golden(lambda: _prefixed(tcls, 64, 64, 1),
            mycls(64, 64, 1), (1, 64, 14, 14), atol=2e-4)


@pytest.mark.parametrize("c1", [32, 16])
def test_transformer_block_golden(c1):
    load_reference()
    from models.common import TransformerBlock as TTB
    from yolo_series_tpu.models.attention import TransformerBlock

    _golden(lambda: _prefixed(TTB, c1, 32, 4, 2),
            TransformerBlock(c1, 32, 4, 2), (2, c1, 8, 8))
