"""On-device preprocessing: cv2 parity (the graph must reproduce the host
pipeline so serving accuracy is unchanged when preprocess moves on-device)."""

import cv2
import numpy as np
import jax.numpy as jnp

from dfine_tpu.ops.preprocess import preprocess_letterbox, preprocess_plain


def test_plain_resize_matches_cv2_inter_linear():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (1, 253, 317, 3), np.uint8)
    for hw in ((128, 160), (512, 640), (253, 317)):
        ours = np.asarray(preprocess_plain(jnp.asarray(raw), hw))[0]
        ref = cv2.resize(raw[0].astype(np.float32) / 255.0, (hw[1], hw[0]),
                         interpolation=cv2.INTER_LINEAR)
        if ref.ndim == 2:
            ref = ref[..., None]
        np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=5e-5)


def test_letterbox_matches_host_letterbox():
    from dfine_tpu.data.augment import letterbox

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 255, (1, 200, 400, 3), np.uint8)
    ours = np.asarray(preprocess_letterbox(jnp.asarray(raw), (128, 128)))[0]
    host, _, (top, left) = letterbox(raw[0], (128, 128))
    host = host.astype(np.float32) / 255.0
    # pad areas must match exactly; content to resize tolerance
    np.testing.assert_allclose(ours[:top], host[:top], atol=2e-3)
    inner_ours = ours[top : 128 - top]
    inner_host = host[top : 128 - top]
    assert np.abs(inner_ours - inner_host).mean() < 2e-3
