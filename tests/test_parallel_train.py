"""Mesh data-parallel training-step tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.losses import LossHyp, make_compute_loss, make_compute_loss_ota
from yolo_series_tpu.models.model import Model
from yolo_series_tpu.parallel.mesh import make_mesh, replicated
from yolo_series_tpu.train.optim import OptimConfig, param_groups, GROUP_BIAS, GROUP_DECAY
from yolo_series_tpu.train.schedules import warmup_factors
from yolo_series_tpu.train.step import init_train_state, make_train_step


def _tiny_batch(rng, batch, img, m=8, nt=2):
    x = rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32)
    labels = np.zeros((batch, m, 5), np.float32)
    labels[:, :nt, 0] = rng.integers(0, 80, (batch, nt))
    labels[:, :nt, 1:3] = rng.uniform(0.3, 0.7, (batch, nt, 2))
    labels[:, :nt, 3:5] = rng.uniform(0.1, 0.3, (batch, nt, 2))
    mask = np.zeros((batch, m), bool)
    mask[:, :nt] = True
    return x, labels, mask


def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_param_groups():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    groups = param_groups(m.params)
    flat = jax.tree_util.tree_flatten_with_path(groups)[0]
    n_bias = sum(1 for _, g in flat if g == GROUP_BIAS)
    n_decay = sum(1 for _, g in flat if g == GROUP_DECAY)
    assert n_bias > 0 and n_decay > 0
    # detect-head conv biases must be in the bias group
    pflat = dict(
        ("/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path), g)
    for path, g in flat)
    head_bias = [k for k in pflat if k.endswith("/b")]
    assert head_bias and all(pflat[k] == GROUP_BIAS for k in head_bias)
    # BN biases belong to the bias group too — the reference's
    # hasattr(v,'bias') walk collects BatchNorm biases into pg2
    # (reference train.py:117-118)
    bn_bias = [k for k in pflat if k.endswith("bn/bias")]
    assert bn_bias and all(pflat[k] == GROUP_BIAS for k in bn_bias)
    bn_scale = [k for k in pflat if k.endswith("bn/scale")]
    assert bn_scale and all(pflat[k] == 0 for k in bn_scale)  # pg0 no-decay


def test_sharded_step_matches_single_device():
    """DP-sharded step == unsharded step (same math, XLA inserts collectives)."""
    img, batch = 64, 8
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
                        key=jax.random.PRNGKey(7))
    loss_fn = make_compute_loss(m.plan.head, LossHyp())
    cfg = OptimConfig()
    rng = np.random.default_rng(0)
    x, labels, mask = _tiny_batch(rng, batch, img)
    lr_groups, mom = warmup_factors(jnp.float32(500), 100, jnp.float32(1.0),
                                    300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    ts0 = init_train_state(copy(m.params), copy(m.state), cfg)
    step_1dev = make_train_step(m.plan, loss_fn, cfg, mesh=None,
                                compute_dtype=jnp.float32)
    ts1, m1 = step_1dev(ts0, jnp.asarray(x), jnp.asarray(labels),
                        jnp.asarray(mask), lr_groups, mom)

    mesh = make_mesh(n_data=8)
    ts0b = init_train_state(m.params, m.state, cfg)
    ts0b = jax.device_put(ts0b, replicated(mesh))
    step_8dev = make_train_step(m.plan, loss_fn, cfg, mesh=mesh,
                                compute_dtype=jnp.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P
    bsh = NamedSharding(mesh, P("data"))
    ts8, m8 = step_8dev(ts0b, jax.device_put(jnp.asarray(x), bsh),
                        jax.device_put(jnp.asarray(labels), bsh),
                        jax.device_put(jnp.asarray(mask), bsh),
                        lr_groups, mom)

    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4, atol=1e-5)
    # updates must agree up to fp32 reduction-order noise: compare the
    # one-step deltas, not raw params, and bound the relative deviation
    d1 = jax.tree_util.tree_map(lambda a, b: a - b, ts1.params, m.params)
    d8 = jax.tree_util.tree_map(lambda a, b: a - b, ts8.params, m.params)
    num = sum(float(jnp.sum(jnp.square(a - b)))
              for a, b in zip(jax.tree_util.tree_leaves(d1),
                              jax.tree_util.tree_leaves(d8)))
    den = sum(float(jnp.sum(jnp.square(a)))
              for a in jax.tree_util.tree_leaves(d1))
    rel = (num / max(den, 1e-20)) ** 0.5
    assert rel < 0.02, f"sharded/unsharded update divergence {rel:.4f}"


def test_grad_accumulation_step():
    img = 64
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    loss_fn = make_compute_loss_ota(m.plan.head, LossHyp())
    cfg = OptimConfig()
    ts = init_train_state(m.params, m.state, cfg)
    step_fn = make_train_step(m.plan, loss_fn, cfg, accumulate=2,
                              compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x, labels, mask = _tiny_batch(rng, 4, img)
    shp = lambda a: a.reshape(2, 2, *a.shape[1:])
    lr_groups, mom = warmup_factors(jnp.float32(0), 100, jnp.float32(0.0),
                                    300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)
    ts2, metrics = step_fn(ts, jnp.asarray(shp(x)), jnp.asarray(shp(labels)),
                           jnp.asarray(shp(mask)), lr_groups, mom)
    assert np.isfinite(float(metrics["total"]))
    assert int(ts2.step) == 1


def test_grad_accumulation_sums_micro_grads():
    """Reference semantics (train.py:372-384): micro-batch grads are SUMMED
    into the optimizer step. Check: accumulate=2 over the same micro-batch
    with a half-scaled loss == accumulate=1 with the full loss."""
    img = 64
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    base_loss = make_compute_loss(m.plan.head, LossHyp())
    half_loss = lambda raw, lb, mk: (  # noqa: E731
        lambda t, i: (t * 0.5, i))(*base_loss(raw, lb, mk))
    cfg = OptimConfig()
    rng = np.random.default_rng(3)
    x, labels, mask = _tiny_batch(rng, 2, img)
    lr_groups, mom = warmup_factors(jnp.float32(50), 10, jnp.float32(1.0),
                                    300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)

    ts_a = init_train_state(m.params, m.state, cfg)
    fn_a = make_train_step(m.plan, base_loss, cfg, compute_dtype=jnp.float32)
    ts_a, _ = fn_a(ts_a, jnp.asarray(x), jnp.asarray(labels),
                   jnp.asarray(mask), lr_groups, mom)

    ts_b = init_train_state(m.params, m.state, cfg)
    fn_b = make_train_step(m.plan, half_loss, cfg, accumulate=2,
                           compute_dtype=jnp.float32)
    dup = lambda a: np.stack([a, a])  # noqa: E731
    ts_b, _ = fn_b(ts_b, jnp.asarray(dup(x)), jnp.asarray(dup(labels)),
                   jnp.asarray(dup(mask)), lr_groups, mom)

    for a, b in zip(jax.tree_util.tree_leaves(ts_a.params),
                    jax.tree_util.tree_leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_overfit_tiny():
    """End-to-end trainer integration: loss decreases on a fixed tiny batch."""
    img = 64
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
                        key=jax.random.PRNGKey(3))
    loss_fn = make_compute_loss(m.plan.head, LossHyp())
    cfg = OptimConfig(lr0=0.01)
    ts = init_train_state(m.params, m.state, cfg)
    step_fn = make_train_step(m.plan, loss_fn, cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x, labels, mask = _tiny_batch(rng, 2, img)
    x, labels, mask = jnp.asarray(x), jnp.asarray(labels), jnp.asarray(mask)
    losses = []
    for i in range(30):
        lr_groups, mom = warmup_factors(jnp.float32(i), 10, jnp.float32(0.0),
                                        300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)
        ts, metrics = step_fn(ts, x, labels, mask, lr_groups, mom)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0] * 0.8, losses[::5]


def test_multi_scale_and_freeze_step():
    img = 64
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    loss_fn = make_compute_loss(m.plan.head, LossHyp())
    cfg = OptimConfig()
    ts = init_train_state(m.params, m.state, cfg)
    p0 = jax.tree_util.tree_map(jnp.copy, ts.params)
    step_fn = make_train_step(m.plan, loss_fn, cfg, compute_dtype=jnp.float32,
                              freeze=5, resize_to=96)
    rng = np.random.default_rng(2)
    x, labels, mask = _tiny_batch(rng, 2, img)
    lr_groups, mom = warmup_factors(jnp.float32(100), 10, jnp.float32(1.0),
                                    300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)
    ts2, metrics = step_fn(ts, jnp.asarray(x), jnp.asarray(labels),
                           jnp.asarray(mask), lr_groups, mom)
    assert np.isfinite(float(metrics["total"]))
    # frozen layers unchanged, later layers updated
    for li in range(5):
        a = jax.tree_util.tree_leaves(ts2.params["layers"][li])
        b = jax.tree_util.tree_leaves(p0["layers"][li])
        assert all(float(jnp.max(jnp.abs(x1 - x2))) == 0 for x1, x2 in zip(a, b))
    a = jax.tree_util.tree_leaves(ts2.params["layers"][21])  # 20 is a Concat
    b = jax.tree_util.tree_leaves(p0["layers"][21])
    assert any(float(jnp.max(jnp.abs(x1 - x2))) > 0 for x1, x2 in zip(a, b))


def test_remat_prefix_is_exact():
    """Stem remat (apply_model remat_prefix, the MFU bandwidth-for-FLOPs
    lever): jax.checkpoint recomputes the SAME ops, so the one-step
    params must be bitwise-identical with and without it."""
    img = 64
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
                        key=jax.random.PRNGKey(7))
    loss_fn = make_compute_loss(m.plan.head, LossHyp())
    cfg = OptimConfig()
    rng = np.random.default_rng(0)
    x, labels, mask = _tiny_batch(rng, 2, img)
    lr_groups, mom = warmup_factors(jnp.float32(500), 100, jnp.float32(1.0),
                                    300, cfg.lr0, 0.1, 0.1, 0.8, cfg.momentum)
    outs = {}
    for rp in (0, 4):
        ts = init_train_state(m.params, m.state, cfg)
        fn = make_train_step(m.plan, loss_fn, cfg, compute_dtype=jnp.float32,
                             remat_prefix=rp)
        ts2, met = fn(ts, jnp.asarray(x), jnp.asarray(labels),
                      jnp.asarray(mask), lr_groups, mom)
        outs[rp] = (float(met["total"]), ts2.params)
    assert outs[0][0] == outs[4][0]
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[4][1])):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_per_replica_bn_matches_dataparallel_split():
    """--no-sync-bn (bn_shards=g): full-batch training forward == g
    INDEPENDENT per-shard forwards — the reference's default unsynced
    multi-GPU BN (DataParallel replicas / DDP without --sync-bn,
    train.py:240-242) — and != the synced default; running stats follow
    shard 0 (torch DDP broadcast_buffers rank-0 semantics)."""
    from yolo_series_tpu.models.model import Model, apply_model

    g, per = 4, 2
    m = Model.from_yaml("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml",
                        key=jax.random.PRNGKey(11))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (g * per, 64, 64, 3)).astype(np.float32))

    out_pr, st_pr = apply_model(m.plan, m.params, m.state, x,
                                training=True, bn_shards=g)

    # g independent replicas, each on its contiguous sub-batch
    outs, st0 = [], None
    for i in range(g):
        o, s = apply_model(m.plan, m.params, m.state,
                           x[i * per:(i + 1) * per], training=True)
        outs.append(o["raw"])
        if i == 0:
            st0 = s
    for lvl in range(len(out_pr["raw"])):
        split = jnp.concatenate([o[lvl] for o in outs], axis=0)
        # tolerance: grouped vs separate forwards reduce in different
        # shapes, so fp32 rounding differs at ~1e-4 on O(5) activations
        np.testing.assert_allclose(np.asarray(out_pr["raw"][lvl]),
                                   np.asarray(split), rtol=1e-3, atol=1e-4)
    # running stats == replica 0's
    for a, b in zip(jax.tree_util.tree_leaves(st_pr),
                    jax.tree_util.tree_leaves(st0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # and it is NOT the synced behavior
    out_sync, _ = apply_model(m.plan, m.params, m.state, x, training=True)
    diff = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(out_pr["raw"], out_sync["raw"]))
    assert diff > 1e-3, f"per-replica == synced (diff {diff}); flag vacuous"


def test_per_replica_bn_matches_torch_oracle():
    """layers._batch_norm_per_replica vs torch BatchNorm2d run per shard
    (eps=1e-3, momentum=0.03 — reference torch_utils.initialize_weights):
    outputs per shard and shard-0 running stats must match."""
    torch = pytest.importorskip("torch")

    from yolo_series_tpu.models.layers import Ctx, batch_norm

    g, per, c = 2, 3, 8
    rng = np.random.default_rng(9)
    x = rng.normal(0, 2, (g * per, 5, 7, c)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, c).astype(np.float32)
    bias = rng.uniform(-0.5, 0.5, c).astype(np.float32)
    rmean = rng.normal(0, 0.3, c).astype(np.float32)
    rvar = rng.uniform(0.5, 1.5, c).astype(np.float32)

    ctx = Ctx(training=True, bn_shards=g)
    y, new_state = batch_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        {"mean": jnp.asarray(rmean), "var": jnp.asarray(rvar)},
        jnp.asarray(x), ctx)

    for i in range(g):
        bn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.03)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(scale))
            bn.bias.copy_(torch.from_numpy(bias))
            bn.running_mean.copy_(torch.from_numpy(rmean))
            bn.running_var.copy_(torch.from_numpy(rvar))
        bn.train()
        xt = torch.from_numpy(
            x[i * per:(i + 1) * per].transpose(0, 3, 1, 2))
        yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y[i * per:(i + 1) * per]), yt,
                                   rtol=1e-4, atol=1e-5)
        if i == 0:
            np.testing.assert_allclose(np.asarray(new_state["mean"]),
                                       bn.running_mean.numpy(),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(new_state["var"]),
                                       bn.running_var.numpy(),
                                       rtol=1e-5, atol=1e-6)


def test_host_local_slice():
    from yolo_series_tpu.parallel.mesh import host_local_slice

    s = host_local_slice(64, process_index=2, process_count=4)
    assert (s.start, s.stop) == (32, 48)
    s0 = host_local_slice(64)  # single-process: the whole batch
    assert (s0.start, s0.stop) == (0, 64)


def test_warmup_factors_schedule():
    # inside warmup: bias lr descends from warmup_bias_lr, main lr ascends
    lr0, lrf = 0.01, 0.1
    lr_g, mom = warmup_factors(jnp.float32(0), 100, jnp.float32(0.0), 300,
                               lr0, lrf, 0.1, 0.8, 0.937)
    assert float(lr_g[2]) == pytest.approx(0.1, abs=1e-6)   # bias starts high
    assert float(lr_g[0]) == pytest.approx(0.0, abs=1e-6)   # main starts at 0
    assert float(mom) == pytest.approx(0.8, abs=1e-6)
    # past warmup: all groups at the cosine schedule value
    lr_g2, mom2 = warmup_factors(jnp.float32(1000), 100, jnp.float32(0.0),
                                 300, lr0, lrf, 0.1, 0.8, 0.937)
    assert float(lr_g2[0]) == pytest.approx(float(lr_g2[2]))
    assert float(mom2) == pytest.approx(0.937, abs=1e-6)


def test_fused_serving_sharded_equals_single_device():
    """The fused serving program (ops/nms.fused_head_nms) under a
    'data'-sharded mesh == single-device results — the pod-serving path
    (batch parallel over ICI; every op is per-image so XLA shards it
    without collectives)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.nms import fused_head_nms
    from yolo_series_tpu.parallel.mesh import make_mesh

    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    plan = m.plan
    head = plan.head
    hp = params["layers"][-1]

    def serve(x):
        xf = x.astype(jnp.float32) / 255.0
        feats, _ = apply_model(plan, params, state, xf, training=False,
                               return_head_inputs=True)
        return fused_head_nms(head, hp, feats, conf_thres=0.25,
                              iou_thres=0.45, max_det=50, max_nms=256,
                              compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (8, 160, 160, 3)).astype(np.uint8)

    want = jax.jit(serve)(jnp.asarray(x))

    mesh = make_mesh(n_data=8, n_model=1)
    bsh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(jnp.asarray(x), bsh)
    got = jax.jit(serve, in_shardings=(bsh,))(xs)

    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_multiscale_resize_preserves_label_geometry():
    """The bucketed multi-scale rescale (train/step.py resize_to — the
    static-shape replacement for the reference's per-batch ±50%
    interpolate, train.py:360-365) must keep NORMALIZED labels aligned:
    objects stay at the same normalized box through the resize (no crop,
    no shift, no convention mismatch). Trusted-comment -> tested claim
    (round-2 review Weak #8)."""
    import jax

    # a sharp rectangle at known normalized coords survives the resize at
    # the same normalized coords (within one destination pixel)
    src, dst = 160, 192
    box = (0.25, 0.40, 0.60, 0.80)  # normalized x1 y1 x2 y2
    img = np.zeros((1, src, src, 3), np.float32)
    x1, y1, x2, y2 = (int(round(v * src)) for v in box)
    img[:, y1:y2, x1:x2] = 1.0
    out = np.asarray(jax.image.resize(
        jnp.asarray(img), (1, dst, dst, 3), method="bilinear"))
    ys, xs = np.where(out[0, :, :, 0] > 0.5)
    got = (xs.min() / dst, ys.min() / dst,
           (xs.max() + 1) / dst, (ys.max() + 1) / dst)
    np.testing.assert_allclose(got, (x1 / src, y1 / src, x2 / src, y2 / src),
                               atol=1.0 / dst + 1e-6)

    # sub-pixel: a linear ramp resamples to the same normalized field
    # (bilinear of a linear function is exact away from the border)
    ramp = np.broadcast_to(
        np.linspace(0.0, 1.0, src, dtype=np.float32)[None, None, :, None],
        (1, src, src, 3)).copy()
    rout = np.asarray(jax.image.resize(
        jnp.asarray(ramp), (1, dst, dst, 3), method="bilinear"))
    # compare at interior pixels against the exact linear map
    interior = slice(4, dst - 4)
    u = (np.arange(dst, dtype=np.float64) + 0.5) * src / dst - 0.5
    exact = np.interp(u, np.arange(src), np.linspace(0.0, 1.0, src))
    np.testing.assert_allclose(rout[0, 8, interior, 0], exact[interior],
                               atol=1e-5)


def test_fused_serving_tensor_parallel_equals_single_device():
    """TP serving: conv weights column-sharded over the 'model' axis
    (parallel/mesh.param_partition_specs) on a 2x4 (data, model) mesh ==
    single-device results. This is the latency-scaling deployment shape
    (weights sharded, XLA inserts the gathers over ICI) the reserved
    'model' axis exists for."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model
    from yolo_series_tpu.ops.nms import fused_head_nms
    from yolo_series_tpu.parallel.mesh import make_mesh, param_partition_specs

    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    plan = m.plan
    head = plan.head

    def serve(params, x):
        xf = x.astype(jnp.float32) / 255.0
        feats, _ = apply_model(plan, params, state, xf, training=False,
                               return_head_inputs=True)
        return fused_head_nms(head, params["layers"][-1], feats,
                              conf_thres=0.25, iou_thres=0.45, max_det=50,
                              max_nms=256, compute_dtype=jnp.float32)

    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (4, 160, 160, 3)).astype(np.uint8)

    want = jax.jit(serve)(params, jnp.asarray(x))

    mesh = make_mesh(n_data=2, n_model=4)
    pspec = param_partition_specs(params, 4)
    psh = jax.tree_util.tree_map(
        lambda sp: NamedSharding(mesh, sp), pspec)
    params_tp = jax.tree_util.tree_map(jax.device_put, params, psh)
    bsh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(jnp.asarray(x), bsh)
    got = jax.jit(serve, in_shardings=(psh, bsh))(params_tp, xs)

    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
