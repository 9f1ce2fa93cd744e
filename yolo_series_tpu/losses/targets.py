"""Vectorized label assignment (the reference's build_targets family).

The reference builds variable-length index lists per level with boolean
masking (utils/loss.py:500-553 build_targets, loss.py:794-845
find_3_positive, loss.py:1592-1643 find_5_positive). On TPU everything is
static-shape: labels are padded to (B, M, 5) with a validity mask, and each
(gt, anchor, offset) triple is a *candidate slot* with its own validity bit
— no gather/boolean-compress, one jit.

Candidate layout per level: (B, M, na, K) where K = number of lateral
offsets (5 for the g=0.5 three-positive scheme, 5 for the g=1.0 five-
positive scheme — same neighbors, wider trigger window).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# offset directions: center, left, up, right, down (reference loss.py:510-514)
_OFF = np.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], np.float32)


@dataclasses.dataclass(frozen=True)
class LevelCandidates:
    """Static-shape assignment candidates for one pyramid level.

    All arrays are (B, M, na, K); `tbox` is (B, M, na, K, 4) in grid units,
    `anchor` is (na, 2) in grid units.
    """

    gi: jnp.ndarray          # int32 grid x
    gj: jnp.ndarray          # int32 grid y
    valid: jnp.ndarray       # bool
    tbox: jnp.ndarray        # (dx, dy, w, h) target box rel. to cell
    tcls: jnp.ndarray        # int32 class, (B, M) broadcastable
    anchors: jnp.ndarray     # (na, 2) grid units


def find_positive(labels: jnp.ndarray, label_mask: jnp.ndarray,
                  anchors: np.ndarray, grid: Tuple[int, int],
                  anchor_t: float, g: float = 0.5) -> LevelCandidates:
    """Candidates for one level.

    labels: (B, M, 5) rows [cls, x, y, w, h] normalized; label_mask (B, M).
    anchors: (na, 2) in *grid units* (already divided by stride).
    grid: (ny, nx). g: offset trigger radius (0.5 -> 3-positive per axis,
    1.0 -> 5-positive, reference loss.py:1592).
    """
    ny, nx = grid
    na = anchors.shape[0]
    b, m, _ = labels.shape

    gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
    txywh = labels[..., 1:5] * gain                    # (B, M, 4) grid units
    txy = txywh[..., 0:2]
    twh = txywh[..., 2:4]

    anc = jnp.asarray(anchors, jnp.float32)            # (na, 2)
    r = twh[:, :, None, :] / anc[None, None, :, :]     # (B, M, na, 2)
    anchor_ok = jnp.maximum(r, 1.0 / r).max(-1) < anchor_t  # (B, M, na)

    inv = jnp.asarray([nx, ny], jnp.float32) - txy
    fx, fy = txy[..., 0] % 1.0, txy[..., 1] % 1.0
    ix, iy = inv[..., 0] % 1.0, inv[..., 1] % 1.0
    off_ok = jnp.stack([
        jnp.ones_like(fx, dtype=bool),
        (fx < g) & (txy[..., 0] > 1.0),
        (fy < g) & (txy[..., 1] > 1.0),
        (ix < g) & (inv[..., 0] > 1.0),
        (iy < g) & (inv[..., 1] > 1.0),
    ], axis=-1)                                        # (B, M, K)

    off = jnp.asarray(_OFF * g)                        # (K, 2)
    # gij = floor(txy - off), clamped (reference clamps in-place so the box
    # target uses the clamped cell, loss.py:545-548)
    gxy = txy[:, :, None, :] - off[None, None, :, :]   # (B, M, K, 2)
    gij = jnp.floor(gxy).astype(jnp.int32)
    gi = jnp.clip(gij[..., 0], 0, nx - 1)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)

    dxy = txy[:, :, None, :] - jnp.stack([gi, gj], -1).astype(jnp.float32)
    tbox = jnp.concatenate(
        [dxy, jnp.broadcast_to(twh[:, :, None, :], dxy.shape)], axis=-1)  # (B,M,K,4)

    valid = label_mask[:, :, None, None] & anchor_ok[:, :, :, None] & off_ok[:, :, None, :]

    # broadcast to (B, M, na, K)
    def bkast(x):
        return jnp.broadcast_to(x[:, :, None, :], (b, m, na, x.shape[-1]))

    return LevelCandidates(
        gi=bkast(gi), gj=bkast(gj), valid=valid,
        tbox=jnp.broadcast_to(tbox[:, :, None, :, :], (b, m, na, 5, 4)),
        tcls=labels[..., 0].astype(jnp.int32),
        anchors=anc,
    )
