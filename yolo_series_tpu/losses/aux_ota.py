"""ComputeLossAuxOTA — coarse-to-fine deep supervision for IAuxDetect.

Reference utils/loss.py:1175-1696: the lead branch assigns with the
3-positive scheme + top-20 dynamic-k (loss.py:1286-1437), the auxiliary
branch assigns with the wider 5-positive scheme (g=1.0, find_5_positive,
loss.py:1592-1643) + top-20 — BOTH assignments are computed from the LEAD
predictions (build_targets2(p[:nl]), loss.py:1205) — and the aux terms are
weighted 0.25 (loss.py:1258, 1268, 1272).

raw layout: [lead_0..lead_{nl-1}, aux_0..aux_{nl-1}] as produced by
IAuxDetect in training mode (models/heads.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.losses.ota import ota_assign_batch, ota_level_loss
from yolo_series_tpu.losses.yolo_loss import LossHyp, balance_for


def make_compute_loss_aux_ota(head, hyp: LossHyp,
                              topk: int = 20):
    nl = len(head.strides)
    balance = balance_for(nl)
    anchors = np.asarray(head.anchors, np.float32).reshape(nl, head.na, 2)
    strides = np.asarray(head.strides, np.float32)
    aux_w = hyp.aux_w

    def compute_loss(raw: Sequence[jnp.ndarray], labels, label_mask):
        assert len(raw) >= 2 * nl, (
            f"aux loss needs {2 * nl} maps (lead + aux), got {len(raw)}")
        lead = [r.astype(jnp.float32) for r in raw[:nl]]
        aux = [r.astype(jnp.float32) for r in raw[nl:2 * nl]]
        bs = lead[0].shape[0]

        fg, mg, offs = ota_assign_batch(lead, labels, label_mask, anchors,
                                        strides, hyp, g=0.5, topk=topk)
        fg_a, mg_a, offs_a = ota_assign_batch(lead, labels, label_mask,
                                              anchors, strides, hyp,
                                              g=1.0, topk=topk)

        lbox = lobj = lcls = jnp.float32(0.0)
        for li in range(nl):
            lb, lo, lc = ota_level_loss(
                lead[li], labels, label_mask,
                fg[:, offs[li]:offs[li + 1]], mg[:, offs[li]:offs[li + 1]],
                anchors[li], hyp, g=0.5)
            lb_a, lo_a, lc_a = ota_level_loss(
                aux[li], labels, label_mask,
                fg_a[:, offs_a[li]:offs_a[li + 1]],
                mg_a[:, offs_a[li]:offs_a[li + 1]],
                anchors[li], hyp, g=1.0)
            lbox += lb + aux_w * lb_a
            lobj += (lo + aux_w * lo_a) * balance[li]
            lcls += lc + aux_w * lc_a

        lbox *= hyp.box
        lobj *= hyp.obj
        lcls *= hyp.cls
        total = (lbox + lobj + lcls) * bs
        return total, {"box": lbox, "obj": lobj, "cls": lcls}

    return compute_loss
