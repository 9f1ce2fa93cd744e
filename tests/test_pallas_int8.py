"""Pallas int8 MXU matmul (ops/pallas_int8.py) + the mixed-int8 quant
path (infer/quant.quantize_model(mixed=True)).

The kernel itself is TPU-only (validated bit-exact vs the XLA int8 conv
on the real chip — KERNELS.json int8 rows, tools/bench_int8_pallas.py);
these tests pin its semantics in Pallas interpret mode on CPU, the
1x1-eligibility predicate, and that the mixed quantizer leaves
non-eligible convs fp. Reference parity role: TRT INT8 per-layer tactic
selection + calibration (reference README.md:192-228)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_series_tpu.infer.quant import (pallas_1x1_eligible, quantize_model)
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.model import Model
from yolo_series_tpu.models.reparam import fuse_model
from yolo_series_tpu.ops.pallas_int8 import int8_matmul_dequant


def test_int8_matmul_dequant_interpret_exact():
    rng = np.random.default_rng(0)
    m, k, n = 320, 256, 128
    xq = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
    wq = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))
    scale = jnp.asarray(rng.uniform(1e-4, 1e-2, (n,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    got = int8_matmul_dequant(xq, wq, scale, bias, bm=256, bk=128, bn=128,
                              interpret=True)
    ref = (xq.astype(jnp.int32) @ wq.astype(jnp.int32)
           ).astype(jnp.float32) * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # M=320 is not a 256-multiple: exercises the pad/slice path
    assert got.shape == (m, n)


def test_eligibility_predicate():
    assert pallas_1x1_eligible(L.ConvBnAct(256, 128, 1, 1))
    assert not pallas_1x1_eligible(L.ConvBnAct(256, 128, 3, 1))   # 3x3
    assert not pallas_1x1_eligible(L.ConvBnAct(256, 128, 1, 2))   # s2
    assert not pallas_1x1_eligible(L.ConvBnAct(256, 256, 1, 1, g=2))
    assert not pallas_1x1_eligible(L.ConvBnAct(96, 128, 1, 1))    # 96%128


def test_mixed_quantization_selective():
    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    qp, _ = quantize_model(m.plan, params, state, mixed=True)

    def count(tree, key):
        if isinstance(tree, dict):
            return (key in tree) + sum(count(v, key) for v in tree.values())
        if isinstance(tree, (list, tuple)):
            return sum(count(v, key) for v in tree)
        return 0

    n_q = count(qp, "wq")
    n_fp = count(qp, "w")
    assert n_q > 0, "mixed quantization found no eligible 1x1 convs"
    assert n_fp > 0, "mixed quantization must keep non-eligible convs fp"
    # full quantization quantizes strictly more
    qp_all, _ = quantize_model(m.plan, params, state, mixed=False)
    assert count(qp_all, "wq") > n_q

    # every quantized leaf really is an eligible 1x1 (spot-check via
    # weight shapes: (1,1,K,N) with 128-aligned K,N)
    def leaves(tree):
        if isinstance(tree, dict):
            if "wq" in tree:
                yield tree["wq"]
            for v in tree.values():
                yield from leaves(v)
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                yield from leaves(v)

    for wq in leaves(qp):
        kh, kw, kc, n = wq.shape
        assert kh == kw == 1 and kc % 128 == 0 and n % 128 == 0


def test_mixed_int8_model_runs_close_cpu():
    # CPU takes the XLA int8 path (the Pallas gate requires a TPU
    # device); the mixed tree must still produce close outputs
    from yolo_series_tpu.models.model import apply_model

    m = Model.from_yaml("yolo_series_tpu/models/cfg/deploy/yolov7-tiny.yaml")
    params, state = fuse_model(m.plan, m.params, m.state)
    qp, qs = quantize_model(m.plan, params, state, mixed=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)), jnp.float32)
    o_fp, _ = apply_model(m.plan, params, state, x)
    o_q, _ = apply_model(m.plan, qp, qs, x)
    # int8 quantization error bound, not exactness: box coords within a
    # pixel-ish, scores within a few percent
    d = np.asarray(jnp.abs(o_fp["pred"] - o_q["pred"]))
    rel = float(np.median(d) / (np.median(np.abs(np.asarray(o_fp["pred"])))
                                + 1e-9))
    assert rel < 0.05, rel
