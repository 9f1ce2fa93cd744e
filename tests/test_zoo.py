"""Long-tail zoo tests: extra blocks, attention blocks, IBin/IKeypoint
heads, SigmoidBin/BinOTA/ranking losses, OREPA deploy equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.models import attention as ATT
from yolo_series_tpu.models import extra as X
from yolo_series_tpu.models import heads as H
from yolo_series_tpu.models.layers import Ctx

CTX = Ctx()


@pytest.mark.parametrize("blk,shape,out_c,spatial_scale", [
    (X.RobustConv(16, 32, 7, 1), (1, 16, 16, 16), 32, 1),
    (X.RobustConv2(16, 32, 7, 4), (1, 16, 16, 16), 32, 1),
    (X.CrossConv(16, 16, 3, 1, shortcut=True), (1, 16, 16, 16), 16, 1),
    (X.MixConv2d(16, 16), (1, 16, 16, 16), 16, 1),
    (X.GhostSPPCSPC(32, 32), (1, 16, 16, 32), 32, 1),
    (X.GhostStem(3, 32), (1, 32, 32, 3), 32, 4),
    (ATT.SwinTransformerBlock(32, 32, 2, 2, window_size=4), (1, 12, 12, 32), 32, 1),
    (ATT.STCSPA(32, 64, 1), (1, 16, 16, 32), 64, 1),
    (ATT.ST2CSPB(32, 64, 1), (1, 16, 16, 32), 64, 1),
    (ATT.TransformerBlock(32, 32, 4, 2), (1, 8, 8, 32), 32, 1),
])
def test_block_shapes(blk, shape, out_c, spatial_scale):
    p, s = blk.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), shape)
    y, _ = blk.apply(p, s, x, CTX)
    assert y.shape[-1] == out_c
    assert y.shape[1] == shape[1] // spatial_scale
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("c1,c2,s", [(16, 16, 1), (16, 32, 2)])
def test_orepa_deploy_equivalence(c1, c2, s):
    for cls in (X.OREPA3x3, X.RepConvOREPA):
        blk = cls(c1, c2, 3, s)
        p, st = blk.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, c1))
        ctx = Ctx(training=False)
        y, _ = blk.apply(p, st, x, ctx)
        dp, ds = blk.deploy(p, st)
        y2, _ = blk.apply(dp, ds, x, ctx)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y),
                                   rtol=1e-3, atol=1e-4)


def test_sigmoid_bin_roundtrip():
    from yolo_series_tpu.losses.bin import SigmoidBin

    sb = SigmoidBin(21, 0.0, 4.0)
    # a peaked bin + neutral residual decodes near the bin center
    pred = np.zeros((5, sb.length), np.float32)
    targets = np.array([0.5, 1.0, 2.0, 3.0, 3.9], np.float32)
    bins = np.asarray(sb.bins())
    for i, t in enumerate(targets):
        pred[i, 1 + np.abs(bins - t).argmin()] = 1.0
        pred[i, 0] = 0.5  # sigmoid-activated neutral residual
    out = np.asarray(sb.forward(jnp.asarray(pred)))
    assert np.abs(out - targets).max() < sb.step

    # training loss decreases towards a matched prediction
    raw_good = np.full((5, sb.length), -8.0, np.float32)
    for i, t in enumerate(targets):
        raw_good[i, 1 + np.abs(bins - t).argmin()] = 8.0
    loss_good, dec = sb.training_loss(jnp.asarray(raw_good), jnp.asarray(targets))
    loss_bad, _ = sb.training_loss(jnp.asarray(-raw_good), jnp.asarray(targets))
    assert float(loss_good) < float(loss_bad)


def test_bin_ota_loss_runs_and_grads():
    from yolo_series_tpu.losses import LossHyp
    from yolo_series_tpu.losses.bin_ota import make_compute_loss_bin_ota

    anc = ((1.0, 1.3, 2, 3, 4, 5),) * 3
    head = H.IBin(nc=8, anchors=anc, ch=(32, 64, 128), strides=(8.0, 16.0, 32.0))
    loss_fn = make_compute_loss_bin_ota(head, LossHyp())
    rng = np.random.default_rng(0)
    raw = [jnp.asarray(rng.normal(0, 1, (2, 3, 128 // s, 128 // s, head.no))
                       .astype(np.float32)) for s in (8, 16, 32)]
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, :3, 0] = rng.integers(0, 8, (2, 3))
    labels[:, :3, 1:3] = rng.uniform(0.3, 0.7, (2, 3, 2))
    labels[:, :3, 3:5] = rng.uniform(0.1, 0.3, (2, 3, 2))
    mask = np.zeros((2, 8), bool)
    mask[:, :3] = True

    def lf(raws):
        total, _ = loss_fn(raws, jnp.asarray(labels), jnp.asarray(mask))
        return total

    total, grads = jax.value_and_grad(lf)(raw)
    assert np.isfinite(float(total))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in grads)


def test_rank_sort_loss():
    from yolo_series_tpu.losses.ranking import ap_loss, rank_sort_loss

    n = 64
    rng = np.random.default_rng(0)
    targets = np.zeros(n, np.float32)
    targets[:8] = rng.uniform(0.5, 1.0, 8)
    valid = np.ones(n, bool)

    # perfect ranking: fg well above bg
    good = np.concatenate([np.linspace(3, 5, 8), np.linspace(-5, -3, n - 8)])
    bad = np.concatenate([np.linspace(-5, -3, 8), np.linspace(3, 5, n - 8)])
    lg = float(rank_sort_loss(jnp.asarray(good), jnp.asarray(targets),
                              jnp.asarray(valid)))
    lb = float(rank_sort_loss(jnp.asarray(bad), jnp.asarray(targets),
                              jnp.asarray(valid)))
    assert lg < 0.1 < lb

    g = jax.grad(lambda x: rank_sort_loss(x, jnp.asarray(targets),
                                          jnp.asarray(valid)))(jnp.asarray(bad))
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient pushes misranked bg scores down, fg scores up
    assert np.asarray(g)[8:].mean() > 0  # descending on bg logits
    assert np.asarray(g)[:8].mean() < 0

    apg = float(ap_loss(jnp.asarray(good), jnp.asarray(targets), jnp.asarray(valid)))
    apb = float(ap_loss(jnp.asarray(bad), jnp.asarray(targets), jnp.asarray(valid)))
    assert apg < apb


def test_ibin_ikeypoint_heads():
    anc = ((10, 13, 16, 30, 33, 23), (30, 61, 62, 45, 59, 119),
           (116, 90, 156, 198, 373, 326))
    anc = tuple(tuple(v / s for v in row) for row, s in zip(anc, (8, 16, 32)))
    for head, exp_cols in [
        (H.IBin(nc=80, anchors=anc, ch=(32, 64, 128), strides=(8., 16., 32.)), 85),
        (H.IKeypoint(nc=1, anchors=anc, ch=(32, 64, 128), strides=(8., 16., 32.),
                     nkpt=17), 57),
    ]:
        p, s = head.init(jax.random.PRNGKey(0))
        p = head.init_biases(p)
        xs = [jax.random.normal(jax.random.PRNGKey(i),
                                (2, 32 // (2 ** i), 32 // (2 ** i), c))
              for i, c in enumerate((32, 64, 128))]
        out, _ = head.apply(p, s, xs, Ctx(training=False))
        assert out["pred"].shape[-1] == exp_cols
        assert np.all(np.isfinite(np.asarray(out["pred"])))


def test_evolve_mutation_bounds(tmp_path):
    from yolo_series_tpu.train.evolve import EVOLVE_META, append_result, mutate

    hyp = {k: (lo + hi) / 2 for k, (_, lo, hi) in EVOLVE_META.items()}
    txt = tmp_path / "evolve.txt"
    # no history: returns clipped copy
    h1 = mutate(dict(hyp), txt)
    for k, (_, lo, hi) in EVOLVE_META.items():
        assert lo <= h1[k] <= hi
    # with history: mutated values stay in bounds
    append_result(txt, [0.5, 0.5, 0.4, 0.3], hyp)
    append_result(txt, [0.6, 0.6, 0.5, 0.4], hyp)
    np.random.seed(0)
    h2 = mutate(dict(hyp), txt)
    for k, (_, lo, hi) in EVOLVE_META.items():
        assert lo <= h2[k] <= hi, k
