"""Published-protocol COCOeval fixtures (VERDICT r3 item #9).

tests/coco_oracle.py and eval/coco_map.py are written by the same hand, so
their 1e-9 agreement cannot catch a shared misreading of the protocol.
These fixtures pin results derived BY HAND from the published COCOeval
definition (cocodataset.org/#detection-eval + the pycocotools reference
algorithm): greedy per-image matching in score order against the
best-available GT, 10 IoU thresholds 0.50:0.05:0.95, 101-point interpolated
precision (recall grid 0:0.01:1), precision envelope = max precision at
recall >= r, maxDets truncation before matching, crowd GTs ignorable (a
detection matched only to a crowd GT is removed from scoring).

Every expected number below is closed-form arithmetic, spelled out in the
comments — no implementation computed them.
"""

import numpy as np

from dfine_tpu.eval.coco_map import compute_map

B = np.array  # shorthand


def _img(labels, boxes, scores=None, iscrowd=None):
    d = {"labels": np.asarray(labels, int),
         "boxes": np.asarray(boxes, np.float32).reshape(-1, 4)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    if iscrowd is not None:
        d["iscrowd"] = np.asarray(iscrowd, bool)
    return d


def test_fixture_halfway_tp_fp():
    """2 images, 1 category.  img1: det == GT (IoU 1.0, score 0.9) -> TP at
    every threshold.  img2: det has IoU 0.4 < 0.5 with its GT (score 0.8)
    -> FP at every threshold.

    Ranked list at every threshold: [TP(0.9), FP(0.8)], npig=2.
      rank1: P=1.0, R=0.5;  rank2: P=0.5, R=0.5.
    Envelope: precision 1.0 for r <= 0.5, 0 beyond (recall never reaches
    >0.5).  101-point grid: r in {0.00..0.50} = 51 points at P=1.0.
      AP = 51/101 = 0.50495...  (same at all 10 thresholds)
    mAR@100 = 0.5 (1 of 2 GTs ever matched).
    """
    g1 = _img([0], [[10, 10, 60, 60]])
    p1 = _img([0], [[10, 10, 60, 60]], [0.9])
    # IoU 0.4 box vs [0,0,100,100]: candidate [0,0,100,57.2] ->
    # inter=5720, union=10000+5720-5720=10000 -> IoU=0.572?  Work in 1D:
    # GT [0,0,100,100] area 1e4; det [0,0,100,40] -> inter 4000, union
    # 1e4 -> IoU 0.4 exactly.
    g2 = _img([0], [[0, 0, 100, 100]])
    p2 = _img([0], [[0, 0, 100, 40]], [0.8])
    m = compute_map([p1, p2], [g1, g2])
    ap = 51.0 / 101.0
    assert abs(m["map_50"] - ap) < 1e-9, m["map_50"]
    assert abs(m["map"] - ap) < 1e-9, m["map"]
    assert abs(m["mar_100"] - 0.5) < 1e-9, m["mar_100"]


def test_fixture_envelope_and_maxdets():
    """1 image, 1 GT, 2 dets: the HIGHER-scored det is a clean FP (zero
    overlap), the lower-scored det matches exactly.

    maxDets=100: ranked [FP(0.9), TP(0.8)], npig=1.
      rank1: P=0, R=0;  rank2: P=0.5, R=1.0.
      Envelope: max precision at recall >= r is 0.5 for EVERY r (the TP
      sits at R=1.0) -> all 101 points at 0.5 -> AP = 0.5 exactly.
      (This pins the right-envelope rule: naive area-under-PR would give
      a different number.)
    maxDets=1: only the FP survives truncation -> AP = 0, AR@1 = 0.
    """
    g = _img([0], [[0, 0, 100, 100]])
    p = _img([0, 0], [[200, 200, 300, 300], [0, 0, 100, 100]], [0.9, 0.8])
    m = compute_map([p], [g])
    assert abs(m["map_50"] - 0.5) < 1e-9, m["map_50"]
    assert abs(m["map"] - 0.5) < 1e-9, m["map"]
    assert abs(m["mar_100"] - 1.0) < 1e-9
    assert abs(m["mar_1"] - 0.0) < 1e-9  # truncation happens BEFORE matching


def test_fixture_crowd_ignore():
    """1 image: one crowd GT and one normal GT.  The only det overlaps the
    crowd region (IoU > 0.5 vs crowd, 0 vs the normal GT).

    Published crowd semantics: a det whose only match is an ignored (crowd)
    GT is removed from scoring entirely — neither TP nor FP.  The normal GT
    stays unmatched.  So: no scored dets, npig=1 (crowd GTs never count in
    npig) -> precision curve empty -> AP = 0, AR = 0.  The det must NOT
    count as an FP (if it did, AP would still be 0 here, so we also check
    the det isn't a TP via recall).
    """
    g = _img([0, 0], [[0, 0, 100, 100], [300, 300, 400, 400]],
             iscrowd=[True, False])
    p = _img([0], [[0, 0, 100, 100]], [0.9])
    m = compute_map([p], [g])
    assert abs(m["map_50"] - 0.0) < 1e-9
    assert abs(m["mar_100"] - 0.0) < 1e-9


def test_fixture_two_categories_mean():
    """2 categories in one image; cat 0 perfect (AP 1.0: P=1 at R=1 ->
    envelope 1.0 everywhere), cat 1 empty preds with 1 GT (AP 0.0).
    map_50 = mean over categories = 0.5.  Per-class table must show both.
    """
    g = _img([0, 1], [[0, 0, 50, 50], [60, 60, 120, 120]])
    p = _img([0], [[0, 0, 50, 50]], [0.9])
    m = compute_map([p], [g])
    assert abs(m["map_50"] - 0.5) < 1e-9
    per = m.get("map_per_class", {})
    assert abs(per.get(0, -1) - 1.0) < 1e-9, per
    assert abs(per.get(1, -1) - 0.0) < 1e-9, per


def test_fixture_score_order_greedy_gt_choice():
    """Greedy matching detail: within one image the higher-scored det picks
    the best-IoU GT first; the next det must take the REMAINING GT even if
    it overlaps the taken one more.

    GTs A=[0,0,100,100], B=[0,0,100,60].  det1 (0.9) = [0,0,100,90]:
    IoU(A)=0.9, IoU(B)=(100*60)/(100*90+100*60-100*60)=0.667 -> takes A.
    det2 (0.8) = [0,0,100,80]: IoU(A)=0.8 (taken), IoU(B)=60/80=0.75 ->
    takes B.  Both TPs at thr 0.5: P=1 at R=1 -> AP@0.5 = 1.0.
    At thr 0.80: det1-A IoU 0.9 >= 0.8 TP; det2-B 0.75 < 0.8 FP ->
    51 points at P=1.0 -> AP@0.80 = 51/101.
    """
    g = _img([0, 0], [[0, 0, 100, 100], [0, 0, 100, 60]])
    p = _img([0, 0], [[0, 0, 100, 90], [0, 0, 100, 80]], [0.9, 0.8])
    m50 = compute_map([p], [g], thresholds=np.array([0.5]))
    assert abs(m50["map"] - 1.0) < 1e-9
    m80 = compute_map([p], [g], thresholds=np.array([0.80]))
    assert abs(m80["map"] - 51.0 / 101.0) < 1e-9


def test_fixture_oracle_agrees_on_published_cases():
    """The sequential oracle must reproduce the same hand-derived numbers —
    this closes the same-hand loop from BOTH sides."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from coco_oracle import oracle_map

    g = _img([0], [[0, 0, 100, 100]])
    p = _img([0, 0], [[200, 200, 300, 300], [0, 0, 100, 100]], [0.9, 0.8])
    m = oracle_map([p], [g])
    assert abs(m["map_50"] - 0.5) < 1e-9
    assert abs(m["map"] - 0.5) < 1e-9
