"""Fused == unfused numerical checks for the re-parameterization transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.graph import compile_graph
from yolo_series_tpu.models.layers import Ctx
from yolo_series_tpu.models.model import apply_model, init_model
from yolo_series_tpu.models.reparam import fuse_block, fuse_model, fuse_repconv


def _randomize_bn_state(state, key):
    """Give BN nontrivial running stats so fusion is actually exercised."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "mean":
            out.append(0.5 * jax.random.normal(k, leaf.shape))
        elif name == "var":
            out.append(jnp.exp(0.3 * jax.random.normal(k, leaf.shape)))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("c1,c2,s", [(32, 32, 1), (32, 64, 1), (32, 64, 2)])
def test_repconv_fusion(c1, c2, s):
    block = L.RepConv(c1, c2, 3, s)
    params, state = block.init(jax.random.PRNGKey(0))
    state = _randomize_bn_state(state, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, c1))
    ctx = Ctx(training=False)
    y_train, _ = block.apply(params, state, x, ctx)
    fp, fs = fuse_repconv(block, params, state)
    y_fused, _ = block.apply(fp, fs, x, ctx)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_train),
                               rtol=1e-4, atol=1e-4)


def test_convbn_fusion():
    block = L.ConvBnAct(16, 24, 3, 2)
    params, state = block.init(jax.random.PRNGKey(0))
    state = _randomize_bn_state(state, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 16))
    ctx = Ctx(training=False)
    y, _ = block.apply(params, state, x, ctx)
    fp, fs = fuse_block(block, params, state)
    assert "bn" not in fp and "b" in fp
    y_f, _ = block.apply(fp, fs, x, ctx)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y), rtol=1e-4, atol=1e-4)


def test_full_model_fusion_tiny():
    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7-tiny.yaml")
    params, state = init_model(plan, jax.random.PRNGKey(0))
    state = _randomize_bn_state(state, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3))
    out, _ = apply_model(plan, params, state, x, training=False)
    fp, fs = fuse_model(plan, params, state)
    out_f, _ = apply_model(plan, fp, fs, x, training=False)
    np.testing.assert_allclose(np.asarray(out_f["pred"]), np.asarray(out["pred"]),
                               rtol=1e-3, atol=2e-3)
    # fused tree must have no BN params anywhere
    paths = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(fp)[0]
    ]
    assert not any("bn" in p for p in paths)
    assert not any("ia" in p or "im" in p for p in paths)


def test_fast_stem_equivalence():
    """Phase-folded stem == standard stem on the fused yolov7-tiny."""
    from yolo_series_tpu.models.faststem import make_fast_stem

    plan = compile_graph("yolo_series_tpu/models/cfg/deploy/yolov7.yaml")
    params, state = init_model(plan, jax.random.PRNGKey(0))
    params, state = fuse_model(plan, params, state)
    plan2, params2, state2 = make_fast_stem(plan, params, state, max_pairs=2)
    assert plan2 is not plan, "pattern should match the yolov7 stem"
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    out1, _ = apply_model(plan, params, state, x, training=False)
    out2, _ = apply_model(plan2, params2, state2, x, training=False)
    np.testing.assert_allclose(np.asarray(out2["pred"]),
                               np.asarray(out1["pred"]), rtol=1e-4, atol=1e-3)


def test_fast_stem_noop_on_tiny():
    """tiny's stem is k3 s2 (no s1 first conv) — transform must no-op."""
    from yolo_series_tpu.models.faststem import make_fast_stem

    plan = compile_graph("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = init_model(plan, jax.random.PRNGKey(0))
    params, state = fuse_model(plan, params, state)
    plan2, p2, s2 = make_fast_stem(plan, params, state)
    assert plan2 is plan


def test_train_reorg_conv_block_exact():
    """[ReOrg, ConvBnAct(4c->c2,k3,s1)] == TrainReorgConv 6x6/s2 fold —
    exact values AND gradients (the fold is a traced weight reshuffle)."""
    from yolo_series_tpu.models.faststem import TrainReorgConv

    c, c2 = 3, 16
    reorg = L.ReOrg(c)
    conv = L.ConvBnAct(4 * c, c2, 3, 1)
    folded = TrainReorgConv(c, c2)
    params, state = conv.init(jax.random.PRNGKey(0))
    state = _randomize_bn_state(state, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, c))

    for training in (False, True):
        ctx = Ctx(training=training)

        def ref_fn(p):
            y, _ = reorg.apply({}, {}, x, ctx)
            y, st = conv.apply(p, state, y, ctx)
            return jnp.sum(jnp.square(y)), (y, st)

        def fold_fn(p):
            y, st = folded.apply(p, state, x, ctx)
            return jnp.sum(jnp.square(y)), (y, st)

        (l1, (y1, st1)), g1 = jax.value_and_grad(ref_fn, has_aux=True)(params)
        (l2, (y2, st2)), g2 = jax.value_and_grad(fold_fn, has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=2e-4), g1, g2)
        if training:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6),
                st1, st2)


def test_train_fast_stem_w6_model():
    """make_train_fast_stem folds the w6 ReOrg stem; eval outputs exact
    vs the original plan with the SAME params/state trees."""
    from yolo_series_tpu.models.faststem import TrainReorgConv, make_train_fast_stem

    plan = compile_graph("yolo_series_tpu/models/cfg/training/yolov7-w6.yaml")
    plan2 = make_train_fast_stem(plan)
    assert plan2 is not plan
    assert isinstance(plan2.layers[1].block, TrainReorgConv)
    params, state = init_model(plan, jax.random.PRNGKey(0))
    state = _randomize_bn_state(state, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3))
    out1, _ = apply_model(plan, params, state, x, training=False)
    out2, _ = apply_model(plan2, params, state, x, training=False)
    np.testing.assert_allclose(np.asarray(out2["pred"]),
                               np.asarray(out1["pred"]), rtol=1e-4, atol=1e-4)


def test_prune_and_sparsity():
    """Per-leaf L1 pruning (torch_utils.prune/sparsity equivalents)."""
    import jax

    from yolo_series_tpu.models.model import Model, apply_model
    from yolo_series_tpu.models.reparam import fuse_model, prune_model, sparsity

    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    s0 = sparsity(params)
    pruned = prune_model(params, amount=0.3)
    s1 = sparsity(pruned)
    assert s1 > s0 + 0.2  # conv kernels dominate the param count
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    out, _ = apply_model(m.plan, pruned, state, x, training=False)
    assert np.all(np.isfinite(np.asarray(out["pred"])))
