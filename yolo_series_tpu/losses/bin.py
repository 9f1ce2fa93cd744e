"""SigmoidBin: bin-classification + residual regression codec
(reference utils/loss.py:33-118), used by the IBin head and
ComputeLossBinOTA.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.losses.yolo_loss import bce_logits


@dataclasses.dataclass(frozen=True)
class SigmoidBin:
    bin_count: int = 10
    vmin: float = 0.0
    vmax: float = 1.0
    reg_scale: float = 2.0
    use_loss_regression: bool = True
    use_fw_regression: bool = True
    bce_weight: float = 1.0
    smooth_eps: float = 0.0

    @property
    def length(self):
        return self.bin_count + 1

    @property
    def scale(self):
        return float(self.vmax - self.vmin)

    @property
    def step(self):
        return self.scale / self.bin_count

    def bins(self):
        start = self.vmin + (self.scale / 2.0) / self.bin_count
        return jnp.asarray(
            np.arange(self.bin_count, dtype=np.float32) * self.step + start)

    def forward(self, pred):
        """Decode (..., length) SIGMOID-ACTIVATED outputs to values
        (reference forward, loss.py:71-86: argmax bin + residual)."""
        pred_reg = (pred[..., 0] * self.reg_scale - self.reg_scale / 2.0) * self.step
        bin_idx = jnp.argmax(pred[..., 1:1 + self.bin_count], axis=-1)
        bias = self.bins()[bin_idx]
        out = pred_reg + bias if self.use_fw_regression else bias
        return jnp.clip(out, self.vmin, self.vmax)

    def training_loss(self, pred, target, valid=None):
        """pred: (..., length) raw LOGITS; target: (...) values.

        Returns (loss_scalar, decoded) — BCE over bins + MSE on the
        regressed value (reference training_loss, loss.py:89-118); `valid`
        masks padded rows.
        """
        cp = 1.0 - 0.5 * self.smooth_eps
        cn = 0.5 * self.smooth_eps
        pred_reg = (jax.nn.sigmoid(pred[..., 0]) * self.reg_scale
                    - self.reg_scale / 2.0) * self.step
        pred_bin = pred[..., 1:1 + self.bin_count]
        bins = self.bins()
        bin_idx = jnp.argmin(jnp.abs(target[..., None] - bins), axis=-1)
        bias = jax.lax.stop_gradient(bins[bin_idx])
        result = pred_reg + bias

        tbins = jnp.full(pred_bin.shape, cn, pred_bin.dtype)
        tbins = jnp.where(jax.nn.one_hot(bin_idx, self.bin_count, dtype=bool),
                          cp, tbins)
        bce = bce_logits(pred_bin, tbins, self.bce_weight)
        if valid is None:
            loss = jnp.mean(bce)
            if self.use_loss_regression:
                loss = loss + jnp.mean(jnp.square(result - target))
        else:
            v = valid.astype(bce.dtype)
            den = jnp.maximum(v.sum(), 1.0)
            loss = jnp.sum(jnp.mean(bce, -1) * v) / den
            if self.use_loss_regression:
                loss = loss + jnp.sum(jnp.square(result - target) * v) / den
        return loss, jnp.clip(result, self.vmin, self.vmax)
