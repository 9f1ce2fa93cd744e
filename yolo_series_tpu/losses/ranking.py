"""Ranking-based losses: RankSort, aLRP, AP (reference utils/loss.py:176-419).

The reference ships these as custom-autograd Functions with per-positive
Python loops and hardcoded .cuda() (unwired into any shipped trainer).
Here the "identity update" gradients are computed as fully-vectorized
pairwise-relation matrices under jax.custom_vjp — static shapes, padded
masks instead of boolean compression.

All take (logits (N,), targets (N,) in [0, 1]) where targets > 0 marks
foreground with its IoU-quality, plus a validity mask for padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _relations(a, b, delta):
    """Smoothed step H((a_j - b_i)/2delta + .5) matrix, rows = anchors i."""
    d = a[None, :] - b[:, None]
    if delta > 0:
        return jnp.clip(d / (2 * delta) + 0.5, 0.0, 1.0)
    return (d >= 0).astype(jnp.float32)


def _rank_sort_core(logits, targets, valid, delta):
    """Returns (ranking_error, sorting_error, fg_grad, bg_grad, fg_mask,
    bg_mask) — vectorized over all positives at once."""
    fg = (targets > 0) & valid
    fg_num = jnp.maximum(jnp.sum(fg), 1)
    min_fg_logit = jnp.min(jnp.where(fg, logits, jnp.inf))
    bg = (targets == 0) & valid & (logits >= min_fg_logit - delta)

    # pairwise relations, masked
    fg_rel = _relations(logits, logits, delta) * fg[None, :]    # (N, N): j fg
    bg_rel = _relations(logits, logits, delta) * bg[None, :]    # (N, N): j bg

    rank_pos = jnp.sum(fg_rel, axis=1)                          # per anchor i
    fp_num = jnp.sum(bg_rel, axis=1)
    rank = rank_pos + fp_num
    ranking_error = jnp.where(fg, fp_num / jnp.maximum(rank, 1e-10), 0.0)

    cur_sort = jnp.sum(fg_rel * (1.0 - targets)[None, :], 1) / \
        jnp.maximum(rank_pos, 1e-10)
    iou_rel = (targets[None, :] >= targets[:, None]) & fg[None, :]
    tso = iou_rel * fg_rel
    rank_pos_t = jnp.sum(tso, 1)
    tgt_sort = jnp.sum(tso * (1.0 - targets)[None, :], 1) / \
        jnp.maximum(rank_pos_t, 1e-10)
    sorting_error = jnp.where(fg, cur_sort - tgt_sort, 0.0)

    # identity-update gradients
    eps = 1e-10
    has_fp = fp_num > eps
    fg_grad = -jnp.where(fg & has_fp, ranking_error, 0.0)
    bg_grad = jnp.sum(
        jnp.where((fg & has_fp)[:, None], bg_rel *
                  (ranking_error / jnp.maximum(fp_num, eps))[:, None], 0.0),
        axis=0)

    missorted = (~iou_rel) & (fg_rel > 0) & fg[:, None] & fg[None, :]
    miss_rel = jnp.where(missorted, fg_rel, 0.0)
    pmf_denom = jnp.sum(miss_rel, 1)
    has_ms = pmf_denom > eps
    fg_grad = fg_grad - jnp.where(fg & has_ms, sorting_error, 0.0)
    fg_grad = fg_grad + jnp.sum(
        jnp.where((fg & has_ms)[:, None], miss_rel *
                  (sorting_error / jnp.maximum(pmf_denom, eps))[:, None], 0.0),
        axis=0)

    grads = (jnp.where(fg, fg_grad, 0.0) + jnp.where(bg, bg_grad, 0.0)) / fg_num
    rank_loss = jnp.sum(jnp.where(fg, ranking_error, 0.0)) / fg_num
    sort_loss = jnp.sum(jnp.where(fg, sorting_error, 0.0)) / fg_num
    return rank_loss, sort_loss, grads


@jax.custom_vjp
def rank_sort_loss(logits, targets, valid, delta=0.5):
    rank_loss, sort_loss, _ = _rank_sort_core(logits, targets, valid, delta)
    return rank_loss + sort_loss


def _rs_fwd(logits, targets, valid, delta):
    rank_loss, sort_loss, grads = _rank_sort_core(logits, targets, valid, delta)
    return rank_loss + sort_loss, grads


def _rs_bwd(grads, g):
    return (g * grads, None, None, None)


rank_sort_loss.defvjp(_rs_fwd, _rs_bwd)


def ap_loss(logits, targets, valid, delta=1.0):
    """Average-precision ranking loss (reference APLoss, loss.py:344-419):
    per-positive precision error distributed over higher-scored bgs."""
    fg = (targets > 0) & valid
    fg_num = jnp.maximum(jnp.sum(fg), 1)
    min_fg_logit = jnp.min(jnp.where(fg, logits, jnp.inf))
    bg = (targets == 0) & valid & (logits >= min_fg_logit - delta)

    fg_rel = _relations(logits, logits, delta) * fg[None, :]
    bg_rel = _relations(logits, logits, delta) * bg[None, :]
    rank_pos = 1.0 + jnp.sum(fg_rel * (1.0 - jnp.eye(logits.shape[0])), 1)
    fp_num = jnp.sum(bg_rel, 1)
    prec = rank_pos / jnp.maximum(rank_pos + fp_num, 1e-10)
    return jnp.sum(jnp.where(fg, 1.0 - prec, 0.0)) / fg_num


def alrp_loss(cls_logits, targets, reg_quality, valid, delta=1.0):
    """average Localisation-Recall-Precision (reference aLRPLoss,
    loss.py:263-341): the AP-style ranking error plus a localisation term
    weighted by the same ranking pmf."""
    fg = (targets > 0) & valid
    fg_num = jnp.maximum(jnp.sum(fg), 1)
    min_fg_logit = jnp.min(jnp.where(fg, cls_logits, jnp.inf))
    bg = (targets == 0) & valid & (cls_logits >= min_fg_logit - delta)

    fg_rel = _relations(cls_logits, cls_logits, delta) * fg[None, :]
    bg_rel = _relations(cls_logits, cls_logits, delta) * bg[None, :]
    rank_pos = jnp.maximum(jnp.sum(fg_rel, 1), 1e-10)
    rank = rank_pos + jnp.sum(bg_rel, 1)
    # localisation error of higher-ranked positives (1 - IoU quality)
    loc_err = jnp.sum(fg_rel * (1.0 - reg_quality)[None, :], 1) / rank_pos
    lrp = (jnp.sum(bg_rel, 1) + jnp.sum(fg_rel * (1.0 - reg_quality)[None, :], 1)) \
        / jnp.maximum(rank, 1e-10)
    cls_term = jnp.sum(jnp.where(fg, lrp, 0.0)) / fg_num
    loc_term = jnp.sum(jnp.where(fg, loc_err, 0.0)) / fg_num
    return cls_term, loc_term
