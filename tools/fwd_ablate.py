"""One-off forward-cost ablation (r3): why is the TRAIN-mode forward 79.7 ms
when the eval forward is far cheaper?  Measures, in ONE session with the
chained protocol (tools/profile_train.timed_chain):

  1. eval fwd bs8 (train=False, Q=300, no CDN, no BN batch stats)
  2. train fwd bs8, CDN OFF (num_denoising=0 -> Q=300, BN batch stats ON)
  3. train fwd bs8, CDN ON (the production config; cache-warm from
     profile_train --what fwd)

(2)-(1) prices BN-batch-stats + aux-head + trainer-mode overheads at equal
query count; (3)-(2) prices CDN (Q 300->500 in self-attn, deform-attn,
heads, dn group builder).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dfine_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from profile_train import make_batch, timed_chain  # noqa: E402

from dfine_tpu.models import build_model, jit_init  # noqa: E402


def feedback(out):
    return sum(
        v.astype(jnp.float32).sum()
        for v in jax.tree.leaves(out)
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.inexact)
    )


def main():
    bs, img, gt, classes = 8, 640, 100, 80
    batch = make_batch(bs, img, gt, classes)

    def measure_train(model, label):
        variables = jit_init(
            model, {"params": jax.random.key(0), "dn": jax.random.key(1)},
            batch["images"][:1], jax.tree.map(lambda x: x[:1], batch["targets"]),
            train=True,
        )

        @jax.jit
        def step(x, fb):
            imgs = batch["images"] + fb * 1e-30
            out, _ = model.apply(
                variables, imgs, batch["targets"], train=True,
                rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"],
            )
            return feedback(out)

        ms = timed_chain(step, None, jnp.float32(0.0), iters=20)
        print(f"{label}: {ms:.1f} ms")

    model = build_model("m", classes, enable_mask_head=False, dtype=jnp.bfloat16)
    variables_e = jit_init(
        model, {"params": jax.random.key(0)}, batch["images"][:1], train=False
    )

    @jax.jit
    def step_eval(x, fb):
        imgs = batch["images"] + fb * 1e-30
        out = model.apply(variables_e, imgs, train=False)
        return feedback(out)

    ms = timed_chain(step_eval, None, jnp.float32(0.0), iters=20)
    print(f"eval fwd bs{bs} (train=False): {ms:.1f} ms")

    model_nocdn = build_model(
        "m", classes, enable_mask_head=False, dtype=jnp.bfloat16,
        cfg_overrides=(("decoder.num_denoising", 0),),
    )
    measure_train(model_nocdn, f"train fwd bs{bs}, CDN OFF")
    measure_train(model, f"train fwd bs{bs}, CDN ON")


if __name__ == "__main__":
    main()
