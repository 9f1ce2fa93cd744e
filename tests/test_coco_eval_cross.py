"""Cross-validation of eval/coco_eval.py (VERDICT r1 item 7).

pycocotools cannot be installed here (zero egress), so this file carries an
INDEPENDENT transliteration of the published COCOeval bbox algorithm
(structured like pycocotools.cocoeval.COCOeval: per-(img,cat) ious dict,
evaluateImg, accumulate with flattened [T,R,K,A,M] arrays) and asserts the
production evaluator matches it exactly on randomized scenarios covering
crowd flags, area ranges, maxDets truncation and score ties — plus
hand-derived fixtures with analytically known AP/AR values.
"""

import numpy as np
import pytest

from yolo_series_tpu.eval.coco_eval import COCOEvaluator

T_THRS = np.linspace(0.5, 0.95, 10)
R_THRS = np.linspace(0.0, 1.0, 101)
AREAS = [(0.0, 1e10), (0.0, 32.0**2), (32.0**2, 96.0**2), (96.0**2, 1e10)]
MAXDETS = [1, 10, 100]


def _iou(d, g, crowd):
    if not len(d) or not len(g):
        return np.zeros((len(d), len(g)))
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        dx1, dy1, dw, dh = db
        for j, gb in enumerate(g):
            gx1, gy1, gw, gh = gb
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if crowd[j] else dw * dh + gw * gh - inter
            out[i, j] = inter / union
    return out


class RefEval:
    """Transliteration of pycocotools.cocoeval.COCOeval (bbox)."""

    def __init__(self, gt, results):
        self.cats = sorted({a["category_id"] for a in gt["annotations"]})
        self.imgs = sorted({im["id"] for im in gt["images"]})
        self._gts = {}
        self._dts = {}
        for img in self.imgs:
            for cat in self.cats:
                self._gts[img, cat] = [a for a in gt["annotations"]
                                       if a["image_id"] == img
                                       and a["category_id"] == cat]
                self._dts[img, cat] = [d for d in results
                                       if d["image_id"] == img
                                       and d["category_id"] == cat]
        self.ious = {}
        for key, gts in self._gts.items():
            dts = sorted(self._dts[key], key=lambda d: -d["score"])
            crowd = [bool(g.get("iscrowd", 0)) for g in gts]
            self.ious[key] = _iou([d["bbox"] for d in dts],
                                  [g["bbox"] for g in gts], crowd)

    def evaluate_img(self, img, cat, arng, max_det):
        gts = self._gts[img, cat]
        dts = sorted(self._dts[img, cat], key=lambda d: -d["score"])[:max_det]
        if not gts and not dts:
            return None
        for g in gts:
            area = g.get("area", g["bbox"][2] * g["bbox"][3])
            g["_ignore"] = (g.get("ignore", 0) or g.get("iscrowd", 0)
                            or area < arng[0] or area > arng[1])
        gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
        gts = [gts[i] for i in gtind]
        ious = (self.ious[img, cat][:, gtind][:len(dts)]
                if len(self.ious[img, cat]) else self.ious[img, cat])
        T, G, D = len(T_THRS), len(gts), len(dts)
        gtm = -np.ones((T, G))
        dtm = -np.ones((T, D))
        gt_ig = np.array([g["_ignore"] for g in gts])
        dt_ig = np.zeros((T, D))
        for tind, t in enumerate(T_THRS):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] >= 0 and not gts[gind].get("iscrowd", 0):
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = m
                gtm[tind, m] = dind
        a = np.array([d["bbox"][2] * d["bbox"][3] < arng[0]
                      or d["bbox"][2] * d["bbox"][3] > arng[1] for d in dts])
        dt_ig = np.logical_or(dt_ig, np.logical_and(
            dtm == -1, np.repeat(a[None], T, 0)))
        return {"dtScores": [d["score"] for d in dts], "dtMatches": dtm,
                "dtIgnore": dt_ig, "npig": int((gt_ig == 0).sum())}

    def accumulate(self):
        T, R = len(T_THRS), len(R_THRS)
        K, A, M = len(self.cats), len(AREAS), len(MAXDETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, cat in enumerate(self.cats):
            for a, arng in enumerate(AREAS):
                for m, md in enumerate(MAXDETS):
                    E = [self.evaluate_img(i, cat, arng, md)
                         for i in self.imgs]
                    E = [e for e in E if e is not None]
                    if not E:
                        continue
                    scores = np.concatenate([e["dtScores"] for e in E])
                    inds = np.argsort(-scores, kind="mergesort")
                    dtm = np.concatenate([e["dtMatches"] for e in E],
                                         1)[:, inds]
                    dt_ig = np.concatenate([e["dtIgnore"] for e in E],
                                           1)[:, inds]
                    npig = sum(e["npig"] for e in E)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm >= 0, np.logical_not(dt_ig))
                    fps = np.logical_and(dtm == -1, np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, 1).astype(float)
                    fp_sum = np.cumsum(fps, 1).astype(float)
                    for t in range(T):
                        tp, fp = tp_sum[t], fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros(R)
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, R_THRS, side="left")
                        for ri, pi in enumerate(inds2):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = q
        self.P, self.R = precision, recall

    def summarize(self):
        self.accumulate()

        def _ap(iou=None, a=0, m=2):
            s = self.P[:, :, :, a, m]
            if iou is not None:
                ti = int(np.where(np.isclose(T_THRS, iou))[0][0])
                s = s[[ti]]
            s = s[s > -1]
            return float(s.mean()) if s.size else -1.0

        def _ar(a=0, m=2):
            s = self.R[:, :, a, m]
            s = s[s > -1]
            return float(s.mean()) if s.size else -1.0

        return {"AP": _ap(), "AP50": _ap(iou=0.5), "AP75": _ap(iou=0.75),
                "APs": _ap(a=1), "APm": _ap(a=2), "APl": _ap(a=3),
                "AR1": _ar(m=0), "AR10": _ar(m=1), "AR100": _ar(m=2),
                "ARs": _ar(a=1), "ARm": _ar(a=2), "ARl": _ar(a=3)}


# -- randomized cross-check -------------------------------------------------


def _random_scenario(seed, n_imgs=4, n_cats=3):
    rng = np.random.default_rng(seed)
    anns, dets = [], []
    aid = 1
    for img in range(n_imgs):
        for _ in range(rng.integers(0, 6)):
            cat = int(rng.integers(0, n_cats))
            # mix small/medium/large areas around the 32^2/96^2 edges
            w, h = rng.choice([8, 30, 34, 64, 95, 97, 160], 2)
            x, y = rng.uniform(0, 400, 2)
            anns.append({"id": aid, "image_id": img, "category_id": cat,
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h),
                         "iscrowd": int(rng.random() < 0.2)})
            aid += 1
        for _ in range(rng.integers(0, 14)):
            cat = int(rng.integers(0, n_cats))
            if anns and rng.random() < 0.6:  # near-duplicate of some gt
                g = anns[int(rng.integers(0, len(anns)))]
                bx = [g["bbox"][0] + rng.normal(0, 6),
                      g["bbox"][1] + rng.normal(0, 6),
                      max(4.0, g["bbox"][2] * rng.uniform(0.7, 1.3)),
                      max(4.0, g["bbox"][3] * rng.uniform(0.7, 1.3))]
                cat = g["category_id"] if rng.random() < 0.8 else cat
            else:
                bx = [float(v) for v in
                      [*rng.uniform(0, 400, 2),
                       *rng.choice([8, 30, 34, 64, 95, 97, 160], 2)]]
            # quantized scores force ties
            dets.append({"image_id": img, "category_id": cat,
                         "bbox": [float(b) for b in bx],
                         "score": round(float(rng.uniform(0.05, 1)), 1)})
    gt = {"images": [{"id": i} for i in range(n_imgs)],
          "annotations": anns,
          "categories": [{"id": c} for c in range(n_cats)]}
    return gt, dets


@pytest.mark.parametrize("seed", range(8))
def test_matches_transliterated_cocoeval(seed):
    gt, dets = _random_scenario(seed)
    if not gt["annotations"]:
        pytest.skip("empty scenario")
    mine = COCOEvaluator(gt, dets).summarize(verbose=False)
    want = RefEval(gt, dets).summarize()
    for k in want:
        assert mine[k] == pytest.approx(want[k], abs=1e-9), (k, mine, want)


# -- hand-derived fixtures --------------------------------------------------


def _gt(images, anns):
    return {"images": [{"id": i} for i in images], "annotations": anns,
            "categories": sorted({a["category_id"] for a in anns})
            and [{"id": c} for c in
                 sorted({a["category_id"] for a in anns})]}


def test_perfect_single_detection():
    anns = [{"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [10, 10, 50, 50], "area": 2500.0, "iscrowd": 0}]
    dets = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 50, 50],
             "score": 0.9}]
    out = COCOEvaluator(_gt([0], anns), dets).summarize(verbose=False)
    assert out["AP"] == 1.0 and out["AP50"] == 1.0 and out["AP75"] == 1.0
    assert out["APm"] == 1.0        # 32^2 < 2500 < 96^2
    assert out["APs"] == -1.0 and out["APl"] == -1.0
    assert out["AR1"] == 1.0 and out["AR100"] == 1.0


def test_iou_exactly_half_matches_only_t50():
    # det covers left half of gt: IoU = 0.5 exactly
    anns = [{"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 0}]
    dets = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 50, 100],
             "score": 0.9}]
    out = COCOEvaluator(_gt([0], anns), dets).summarize(verbose=False)
    assert out["AP50"] == 1.0
    assert out["AP75"] == 0.0
    assert out["AP"] == pytest.approx(0.1)  # only t=0.50 of 10 thresholds


def test_crowd_match_is_ignored_not_fp():
    # image 0: crowd gt absorbed det (ignored); image 1: clean TP.
    anns = [{"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 1},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 0}]
    dets = [
        # IoA vs crowd = 100% (inside it) -> matched to crowd -> ignored
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 50, 50],
         "score": 0.95},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100],
         "score": 0.9},
    ]
    out = COCOEvaluator(_gt([0, 1], anns), dets).summarize(verbose=False)
    # the crowd-absorbed det must not count as FP: precision stays 1.0
    assert out["AP"] == 1.0 and out["AP50"] == 1.0
    # without crowd handling the first (higher-scored) det would be an FP
    # and AP50 would drop to ~0.5


def test_maxdets_truncation():
    # 12 dets; the only true positive is ranked 11th by score
    anns = [{"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [200, 200, 50, 50], "area": 2500.0, "iscrowd": 0}]
    dets = [{"image_id": 0, "category_id": 1,
             "bbox": [float(5 + 60 * i), 5.0, 20.0, 20.0],
             "score": 0.9 - 0.05 * i} for i in range(10)]
    dets.append({"image_id": 0, "category_id": 1,
                 "bbox": [200.0, 200.0, 50.0, 50.0], "score": 0.3})
    dets.append({"image_id": 0, "category_id": 1,
                 "bbox": [5.0, 300.0, 20.0, 20.0], "score": 0.2})
    out = COCOEvaluator(_gt([0], anns), dets).summarize(verbose=False)
    assert out["AR10"] == 0.0   # TP truncated away at maxDets=10
    assert out["AR100"] == 1.0
    assert out["AR1"] == 0.0


def test_area_range_gt_ignore():
    # a small gt is ignored in the large range; its det, unmatched there
    # and itself small, is ignored too -> large range has no data (-1)
    anns = [{"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [0, 0, 20, 20], "area": 400.0, "iscrowd": 0}]
    dets = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 20, 20],
             "score": 0.9}]
    out = COCOEvaluator(_gt([0], anns), dets).summarize(verbose=False)
    assert out["APs"] == 1.0
    assert out["APl"] == -1.0 and out["ARl"] == -1.0


def test_score_tie_uses_stable_order():
    # two dets with the SAME score in one image, only the first listed is
    # the TP; mergesort stability must keep insertion order
    anns = [{"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [0, 0, 50, 50], "area": 2500.0, "iscrowd": 0}]
    dets = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 50, 50],
             "score": 0.5},
            {"image_id": 0, "category_id": 1, "bbox": [300, 300, 50, 50],
             "score": 0.5}]
    mine = COCOEvaluator(_gt([0], anns), dets).summarize(verbose=False)
    want = RefEval(_gt([0], anns), dets).summarize()
    for k in want:
        assert mine[k] == pytest.approx(want[k], abs=1e-9)
    # TP first at equal scores: precision 1.0 at recall 1.0 -> AP == 1
    assert mine["AP"] == 1.0
