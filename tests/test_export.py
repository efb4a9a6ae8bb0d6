"""Export artifacts: StableHLO round-trip, dynamic batch, AOT compile."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_stablehlo_roundtrip_and_dynamic_batch(tmp_path):
    from jax import export as jexport

    from dfine_tpu.export import export_model, make_exported
    from dfine_tpu.models import build_model

    model = build_model("n", num_classes=3, enable_mask_head=False)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    arts = export_model(
        "n", jax.tree.map(np.asarray, variables), 3, tmp_path,
        input_size=(256, 256), half=False, formats=("stablehlo", "npz", "aot"),
        deploy=False,
    )
    assert arts["stablehlo"].exists() and arts["npz"].exists() and arts["aot"].exists()
    assert "flops" in arts["aot"].read_text()

    # round trip: deserialize and execute
    blob = arts["stablehlo"].read_bytes()
    reloaded = jexport.deserialize(bytearray(blob))
    out = jax.jit(reloaded.call)(jnp.zeros((1, 256, 256, 3), jnp.float32))
    assert out["scores"].shape == (1, 300)

    # dynamic batch export executes at several batch sizes
    dyn = make_exported(model, variables, (256, 256), dynamic_batch=True)
    for b in (1, 3):
        out = jax.jit(dyn.call)(jnp.zeros((b, 256, 256, 3), jnp.float32))
        assert out["boxes"].shape == (b, 300, 4)
