"""Literal sequential transcription of the published COCOeval protocol.

Used only as the cross-validation oracle for dfine_tpu.eval.coco_map: every
step (IoU incl. crowd, greedy per-threshold matching, maxDets slicing,
101-point accumulation) is written as plain loops, independently of the
vectorized production code.  Mirrors the pycocotools algorithm
(evaluateImg/accumulate) line for line.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREAS = (("all", 0.0, 1e10), ("small", 0.0, 32.0**2),
         ("medium", 32.0**2, 96.0**2), ("large", 96.0**2, 1e10))


def _iou_one(db, gb, crowd):
    """Single box pair, xyxy."""
    ax = max(0.0, min(db[2], gb[2]) - max(db[0], gb[0]))
    ay = max(0.0, min(db[3], gb[3]) - max(db[1], gb[1]))
    inter = ax * ay
    da = (db[2] - db[0]) * (db[3] - db[1])
    ga = (gb[2] - gb[0]) * (gb[3] - gb[1])
    denom = da if crowd else da + ga - inter
    return inter / denom if denom > 0 else 0.0


def _mask_iou_one(dm, gm, crowd):
    dm = np.asarray(dm, bool)
    gm = np.asarray(gm, bool)
    inter = float(np.logical_and(dm, gm).sum())
    da = float(dm.sum())
    denom = da if crowd else da + float(gm.sum()) - inter
    return inter / denom if denom > 0 else 0.0


def evaluate_img(dt_scores, iou, gt_ig, gt_crowd, thrs):
    """dts score-sorted, gts ignore-sorted.  Returns dtm [T,D] (gt index or
    -1) and dt ignore flags from the match [T,D]."""
    t_n, d_n, g_n = len(thrs), iou.shape[0], iou.shape[1]
    gtm = -np.ones((t_n, g_n), int)
    dtm = -np.ones((t_n, d_n), int)
    dt_ig = np.zeros((t_n, d_n), bool)
    for tind in range(t_n):
        for dind in range(d_n):
            best = min(thrs[tind], 1 - 1e-10)
            m = -1
            for gind in range(g_n):
                if gtm[tind, gind] >= 0 and not gt_crowd[gind]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gind]:
                    break
                if iou[dind, gind] < best:
                    continue
                best = iou[dind, gind]
                m = gind
            if m == -1:
                continue
            dtm[tind, dind] = m
            gtm[tind, m] = dind
            dt_ig[tind, dind] = gt_ig[m]
    return dtm, dt_ig


def oracle_map(preds, gts, iou_type="bbox", max_dets=(1, 10, 100)):
    """Full sequential COCOeval.  Same input/output contract as
    dfine_tpu.eval.coco_map.compute_map."""
    max_dets = sorted(max_dets)
    top = max_dets[-1]
    classes = sorted(
        {int(x) for g in gts for x in np.asarray(g["labels"]).reshape(-1)}
        | {int(x) for p in preds for x in np.asarray(p["labels"]).reshape(-1)}
    )
    # per (class, area): per-image records
    recs = {(c, a): [] for c in classes for a in range(len(AREAS))}
    npig = {(c, a): 0 for c in classes for a in range(len(AREAS))}

    for pred, gt in zip(preds, gts):
        pl = np.asarray(pred["labels"]).astype(int).reshape(-1)
        ps = np.asarray(pred["scores"]).astype(np.float64).reshape(-1)
        gl = np.asarray(gt["labels"]).astype(int).reshape(-1)
        crowd_all = np.asarray(gt.get("iscrowd", np.zeros(len(gl), bool)), bool)
        for c in classes:
            dsel = [i for i in range(len(pl)) if pl[i] == c]
            gsel = [i for i in range(len(gl)) if gl[i] == c]
            if not dsel and not gsel:
                continue
            dsel = sorted(dsel, key=lambda i: -ps[i])[:top]
            if iou_type == "bbox":
                dgeo = [np.asarray(pred["boxes"][i], float) for i in dsel]
                ggeo = [np.asarray(gt["boxes"][i], float) for i in gsel]
                dar = [(b[2] - b[0]) * (b[3] - b[1]) for b in dgeo]
                gar = [(b[2] - b[0]) * (b[3] - b[1]) for b in ggeo]
            else:
                dgeo = [np.asarray(pred["masks"][i], bool) for i in dsel]
                ggeo = [np.asarray(gt["masks"][i], bool) for i in gsel]
                dar = [float(m.sum()) for m in dgeo]
                gar = [float(m.sum()) for m in ggeo]
            crowd = [bool(crowd_all[i]) for i in gsel]
            for a, (_, lo, hi) in enumerate(AREAS):
                gig = [crowd[j] or gar[j] < lo or gar[j] > hi for j in range(len(gsel))]
                npig[(c, a)] += sum(1 for x in gig if not x)
                if not dsel:
                    continue
                order = sorted(range(len(gsel)), key=lambda j: gig[j])
                iou = np.array(
                    [
                        [
                            (_iou_one if iou_type == "bbox" else _mask_iou_one)(
                                dgeo[d], ggeo[order[j]], crowd[order[j]]
                            )
                            for j in range(len(gsel))
                        ]
                        for d in range(len(dsel))
                    ]
                ).reshape(len(dsel), len(gsel))
                gig_s = [gig[j] for j in order]
                crowd_s = [crowd[j] for j in order]
                dtm, dt_ig = evaluate_img(
                    [ps[i] for i in dsel], iou, gig_s, crowd_s, IOU_THRS
                )
                out_rng = np.array([dar[d] < lo or dar[d] > hi for d in range(len(dsel))])
                dt_ig = dt_ig | ((dtm < 0) & out_rng[None, :])
                recs[(c, a)].append(
                    {"scores": np.array([ps[i] for i in dsel]),
                     "matched": dtm >= 0, "ignored": dt_ig}
                )

    t_n = len(IOU_THRS)
    ap = np.full((len(classes), len(AREAS), t_n), np.nan)
    ar = np.full((len(classes), len(AREAS), len(max_dets), t_n), np.nan)
    for ci, c in enumerate(classes):
        for a in range(len(AREAS)):
            if npig[(c, a)] == 0:
                continue
            if not recs[(c, a)]:
                ap[ci, a] = 0.0
                ar[ci, a] = 0.0
                continue
            for mi, md in enumerate(max_dets):
                scores = np.concatenate([r["scores"][:md] for r in recs[(c, a)]])
                matched = np.concatenate(
                    [r["matched"][:, :md] for r in recs[(c, a)]], axis=1
                )
                ignored = np.concatenate(
                    [r["ignored"][:, :md] for r in recs[(c, a)]], axis=1
                )
                order = np.argsort(-scores, kind="mergesort")
                matched, ignored = matched[:, order], ignored[:, order]
                for ti in range(t_n):
                    tp = fp = 0
                    tps, fps = [], []
                    for d in range(matched.shape[1]):
                        if ignored[ti, d]:
                            pass
                        elif matched[ti, d]:
                            tp += 1
                        else:
                            fp += 1
                        tps.append(tp)
                        fps.append(fp)
                    nd = len(tps)
                    rc = [t / npig[(c, a)] for t in tps]
                    pr = [tps[i] / max(tps[i] + fps[i], 1e-300) for i in range(nd)]
                    ar[ci, a, mi, ti] = rc[-1] if nd else 0.0
                    if md == max_dets[-1]:
                        for i in range(nd - 2, -1, -1):
                            pr[i] = max(pr[i], pr[i + 1])
                        q = []
                        for r in REC_THRS:
                            # first index with rc >= r (searchsorted left)
                            pi = next((i for i in range(nd) if rc[i] >= r), nd)
                            q.append(pr[pi] if pi < nd else 0.0)
                        ap[ci, a, ti] = float(np.mean(q))

    def mean(x):
        x = x[~np.isnan(x)]
        return float(x.mean()) if x.size else -1.0

    out = {
        "map": mean(ap[:, 0]),
        "map_50": mean(ap[:, 0, 0]),
        "map_75": mean(ap[:, 0, 5]),
        "map_small": mean(ap[:, 1]),
        "map_medium": mean(ap[:, 2]),
        "map_large": mean(ap[:, 3]),
        "mar_small": mean(ar[:, 1, -1]),
        "mar_medium": mean(ar[:, 2, -1]),
        "mar_large": mean(ar[:, 3, -1]),
        "map_per_class": {c: mean(ap[ci, 0]) for ci, c in enumerate(classes)},
    }
    for mi, md in enumerate(max_dets):
        out[f"mar_{md}"] = mean(ar[:, 0, mi])
    return out
