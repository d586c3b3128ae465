"""COCO-style detection evaluation (counterpart of the reference's
``references/detection/coco_eval.py:1-100``, which wraps pycocotools).

pycocotools is not available in this image, so the COCOeval bbox protocol is
reimplemented in pure numpy:

* greedy per-image, per-class matching in descending score order, each
  detection matched to the highest-IoU unmatched gt (pycocotools
  ``COCOeval.evaluateImg``),
* 10 IoU thresholds 0.50:0.05:0.95,
* 101-point interpolated precision (``COCOeval.accumulate``),
* area ranges all/small/medium/large and maxDets=100.

The entry point mirrors the reference usage: feed per-image predictions and
ground truth, then ``summarize()`` -> dict with ``map`` (AP@[.5:.95]),
``map_50``, ``map_75``, ``map_small/medium/large``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = ["CocoEvaluator", "box_iou_xyxy"]

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def box_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class CocoEvaluator:
    """Accumulates per-image detections + ground truth, computes COCO mAP."""

    def __init__(self, max_dets: int = 100):
        self.max_dets = max_dets
        # per (class) -> list of per-image records
        self._records: Dict[int, List[dict]] = {}

    def update(
        self,
        pred_boxes: np.ndarray,
        pred_scores: np.ndarray,
        pred_labels: np.ndarray,
        gt_boxes: np.ndarray,
        gt_labels: np.ndarray,
    ) -> None:
        """Add one image.  Boxes are xyxy in pixels; padded/invalid rows
        should be removed by the caller before passing."""
        pred_boxes = np.asarray(pred_boxes, np.float64).reshape(-1, 4)
        pred_scores = np.asarray(pred_scores, np.float64).reshape(-1)
        pred_labels = np.asarray(pred_labels).reshape(-1)
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        gt_labels = np.asarray(gt_labels).reshape(-1)

        classes = set(pred_labels.tolist()) | set(gt_labels.tolist())
        for c in classes:
            dmask = pred_labels == c
            gmask = gt_labels == c
            db = pred_boxes[dmask]
            ds = pred_scores[dmask]
            order = np.argsort(-ds, kind="mergesort")[: self.max_dets]
            db, ds = db[order], ds[order]
            gb = gt_boxes[gmask]
            ious = box_iou_xyxy(db, gb) if len(db) and len(gb) else np.zeros((len(db), len(gb)))
            garea = np.maximum(gb[:, 2] - gb[:, 0], 0) * np.maximum(gb[:, 3] - gb[:, 1], 0)
            darea = np.maximum(db[:, 2] - db[:, 0], 0) * np.maximum(db[:, 3] - db[:, 1], 0)
            self._records.setdefault(int(c), []).append(
                dict(scores=ds, ious=ious, garea=garea, darea=darea)
            )

    def _evaluate_class(self, recs: List[dict], area_rng) -> tuple:
        """Greedy matching over all images of a class at every IoU threshold.
        Returns (scores, tp (T, D), n_gt) pooled across images."""
        lo, hi = area_rng
        all_scores, all_tp, all_ignore = [], [], []
        n_gt = 0
        for r in recs:
            gb_ignore = (r["garea"] < lo) | (r["garea"] > hi)
            n_gt += int((~gb_ignore).sum())
            d = len(r["scores"])
            g = len(r["garea"])
            tp = np.zeros((len(IOU_THRS), d), dtype=bool)
            dt_ignore = np.zeros((len(IOU_THRS), d), dtype=bool)
            # pycocotools evaluateImg: gts sorted non-ignored first; a dt may
            # switch to an ignored gt only while it has no real match yet
            g_order = np.argsort(gb_ignore, kind="mergesort")
            for ti, thr in enumerate(IOU_THRS):
                taken = np.zeros(g, dtype=bool)
                for di in range(d):
                    best, bi = min(thr, 1 - 1e-10), -1
                    for gi in g_order:
                        if taken[gi] and not gb_ignore[gi]:
                            continue
                        if bi > -1 and not gb_ignore[bi] and gb_ignore[gi]:
                            break
                        if r["ious"][di, gi] < best:
                            continue
                        best = r["ious"][di, gi]
                        bi = gi
                    if bi >= 0:
                        taken[bi] = True
                        if gb_ignore[bi]:
                            dt_ignore[ti, di] = True
                        else:
                            tp[ti, di] = True
                # unmatched detections outside the area range are ignored
                out_of_rng = (r["darea"] < lo) | (r["darea"] > hi)
                dt_ignore[ti] |= (~tp[ti]) & out_of_rng
            all_scores.append(r["scores"])
            all_tp.append(tp)
            all_ignore.append(dt_ignore)
        if not all_scores:
            return np.zeros(0), np.zeros((len(IOU_THRS), 0), bool), np.zeros((len(IOU_THRS), 0), bool), n_gt
        return (np.concatenate(all_scores), np.concatenate(all_tp, axis=1),
                np.concatenate(all_ignore, axis=1), n_gt)

    def _ap(self, area: str = "all") -> np.ndarray:
        """Per-(class, iou) AP matrix; NaN for classes with no gt."""
        rng = AREA_RANGES[area]
        aps = []
        for c, recs in sorted(self._records.items()):
            scores, tp, ign, n_gt = self._evaluate_class(recs, rng)
            if n_gt == 0:
                continue
            order = np.argsort(-scores, kind="mergesort")
            tp = tp[:, order]
            ign = ign[:, order]
            ap_c = np.zeros(len(IOU_THRS))
            for ti in range(len(IOU_THRS)):
                keep = ~ign[ti]
                tpi = tp[ti][keep].astype(np.float64)
                fpi = (~tp[ti][keep]).astype(np.float64)
                ctp = np.cumsum(tpi)
                cfp = np.cumsum(fpi)
                recall = ctp / n_gt
                precision = ctp / np.maximum(ctp + cfp, 1e-12)
                # monotone-decreasing precision envelope
                for i in range(len(precision) - 2, -1, -1):
                    precision[i] = max(precision[i], precision[i + 1])
                # 101-point interpolation (COCOeval.accumulate)
                if len(precision) == 0:
                    ap_c[ti] = 0.0
                    continue
                idx = np.searchsorted(recall, RECALL_THRS, side="left")
                p = np.zeros(len(RECALL_THRS))
                ok = idx < len(precision)
                p[ok] = precision[idx[ok]]
                ap_c[ti] = p.mean()
            aps.append(ap_c)
        return np.asarray(aps) if aps else np.zeros((0, len(IOU_THRS)))

    def summarize(self) -> Dict[str, float]:
        ap = self._ap("all")
        out = {
            "map": float(ap.mean()) if ap.size else 0.0,
            "map_50": float(ap[:, 0].mean()) if ap.size else 0.0,
            "map_75": float(ap[:, 5].mean()) if ap.size else 0.0,
        }
        for area in ("small", "medium", "large"):
            a = self._ap(area)
            out[f"map_{area}"] = float(a.mean()) if a.size else 0.0
        return out
