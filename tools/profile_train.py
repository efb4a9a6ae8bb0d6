"""Train-step component profiler (TPU).

Measures the D-FINE train step at production shapes and its ablations so
perf work is always against numbers, not guesses (NOTES.md keeps the
history).  Run on the real chip:

    python tools/profile_train.py [--size m] [--img 640] [--bs 8] [--gt 100]
        [--what full|fwdbwd|criterion|optim] [--bwd xla|sorted|pallas]

Each measurement loops >= 10 steps between block_until_ready calls and
reports the per-step mean of the best half (tunnel jitter mitigation).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

# Persistent compile cache: the big train-step programs take 1-3 min to
# compile; without this every profiling run repays them (and with a cold
# cache, eager init pays ~minutes of per-op mini-compiles).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dfine_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    best = times[: max(1, len(times) // 2)]
    return float(np.mean(best) * 1000.0)


def timed_chain(step, x0, fb0, iters=30):
    """Amortized timing with a forced data dependency between iterations.

    The axon runtime can report buffers ready before execution has finished
    (NOTES.md: per-call-sync fwd+bwd measures 5.3 ms vs 11.8 amortized), so
    per-call block_until_ready UNDER-reports.  ``step(x0, fb)`` is a jitted
    function returning a scalar feedback that depends on its full result;
    feeding it back makes cross-iteration overlap impossible, so total wall /
    iters is a true per-call device cost (the protocol the full-step
    measurement gets for free from its state chain)."""
    fb = step(x0, fb0)
    fb = step(x0, fb)
    jax.block_until_ready(fb)
    t0 = time.perf_counter()
    for _ in range(iters):
        fb = step(x0, fb)
    jax.block_until_ready(fb)
    return (time.perf_counter() - t0) / iters * 1000.0


def make_batch(bs, img, gt, num_classes, seed=0, segment=False):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(size=(bs, img, img, 3)).astype(np.float32))
    boxes = rng.uniform(0.2, 0.8, size=(bs, gt, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., 2:] * 0.3, 0.05, 0.4)
    targets = {
        "labels": jnp.asarray(rng.integers(0, num_classes, size=(bs, gt)), jnp.int32),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(np.tile(np.arange(gt)[None] < gt // 2, (bs, 1))),
    }
    if segment:
        # stride-4 uint8 GT masks, like data/dataset.py ships them
        mh = img // 4
        targets["masks"] = jnp.asarray(
            (rng.uniform(size=(bs, gt, mh, mh)) > 0.7).astype(np.uint8))
        targets["mask_valid"] = targets["valid"]
    return {"images": images, "targets": targets}


def profile_loader(args):
    """Input-pipeline probe (VERDICT r2 item #5): loader img/s with and
    without mosaic on this host, plus TPU step-utilization — the fraction of
    wall time the chip is actually stepping when fed by the real loader
    (1.0 == fully compute-bound; < 0.9 means the pipeline starves the chip).
    """
    from dfine_tpu.data.loader import BatchIterator, Loader

    root = args.data
    if not root:
        root = "/tmp/profile_loader_ds"
        if not os.path.exists(os.path.join(root, "train.csv")):
            from tools.synth_dataset import generate

            print(f"generating synthetic dataset at {root} ...")
            generate(root, 256, 32, img_size=args.img, seed=0)

    cfg_train = {
        "img_size": (args.img, args.img),
        "max_gt": args.gt,
        "seed": 0,
        "epochs": 100,
        "label_to_name": {0: "a", 1: "b", 2: "c"},
        "augs": {"left_right_flip": 0.3, "brightness": 0.02, "gamma": 0.02},
        "mosaic_augs": {},
    }

    def measure(mosaic_prob, n_batches=24, cache_mb=0):
        cfg = dict(cfg_train)
        cfg["cache_images_mb"] = cache_mb
        cfg["mosaic_augs"] = {
            "mosaic_prob": mosaic_prob, "no_mosaic_epochs": 0,
            "mosaic_scale": (0.5, 1.5), "degrees": 0.0,
            "translate": 0.2, "shear": 2.0,
        }
        loader = Loader(root, cfg, task="detect")
        it = BatchIterator(
            loader.dataset("train"), args.bs, shuffle=True,
            num_workers=8, seed=0,
        )
        n = 0
        # warm one batch (thread pool spin-up), then time
        gen = iter(it)
        next(gen)
        t0 = time.perf_counter()
        for batch in gen:
            n += batch["images"].shape[0]
            if n >= n_batches * args.bs:
                break
        dt = time.perf_counter() - t0
        return n / dt

    plain = measure(0.0)
    mosaic = measure(0.8)
    mosaic_cached = measure(0.8, cache_mb=2048)
    print(f"loader throughput (bs={args.bs}, {args.img}px, 8 threads): "
          f"{plain:.1f} img/s plain-aug, {mosaic:.1f} img/s mosaic-0.8, "
          f"{mosaic_cached:.1f} img/s mosaic-0.8+cache")

    # ---- step-utilization: pure-step time vs real-loop time
    from dfine_tpu.models import build_model
    from dfine_tpu.train.criterion import CriterionConfig
    from dfine_tpu.train.optim import OptimConfig, build_optimizer
    from dfine_tpu.train.train_step import TrainState, make_train_step

    model = build_model(args.size, 3, enable_mask_head=False, dtype=jnp.bfloat16)
    batch0 = make_batch(args.bs, args.img, args.gt, 3)
    # the real pipeline ships uint8 frames (normalized in-graph); make the
    # pure-step reference compile the SAME program
    batch0 = {**batch0, "images": (batch0["images"] * 255).astype(jnp.uint8)}
    from dfine_tpu.models import jit_init

    variables = jit_init(
        model,
        {"params": jax.random.key(0), "dn": jax.random.key(1)},
        batch0["images"][:1], jax.tree.map(lambda x: x[:1], batch0["targets"]),
        train=True,
    )
    tx = build_optimizer(variables["params"], OptimConfig(steps_per_epoch=32, epochs=4))
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, CriterionConfig(num_classes=3)))
    key = jax.random.key(0)

    def run(state, batch):
        return step(state, batch, key)

    pure_ms = timed(lambda b: run(state, b)[1]["loss"], batch0, iters=12)
    print(f"pure step ({args.size}@{args.img} bs{args.bs}): {pure_ms:.1f} ms")

    cfg = dict(cfg_train)
    cfg["cache_images_mb"] = 2048
    cfg["mosaic_augs"] = {
        "mosaic_prob": 0.8, "no_mosaic_epochs": 0, "mosaic_scale": (0.5, 1.5),
        "degrees": 0.0, "translate": 0.2, "shear": 2.0,
    }
    loader = Loader(root, cfg, task="detect")
    it = BatchIterator(loader.dataset("train"), args.bs, shuffle=True,
                       num_workers=8, seed=0)
    n_steps = 0
    gen = iter(it)
    first = next(gen)  # warm the producer
    state, m = run(state, {"images": jnp.asarray(first["images"]),
                           "targets": jax.tree.map(jnp.asarray, first["targets"])})
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for batch in gen:
        b = {"images": jnp.asarray(batch["images"]),
             "targets": jax.tree.map(jnp.asarray, batch["targets"])}
        state, m = run(state, b)
        n_steps += 1
        if n_steps >= 24:
            break
    jax.block_until_ready(m["loss"])
    loop_ms = (time.perf_counter() - t0) / max(1, n_steps) * 1000
    util = pure_ms / loop_ms
    print(f"real-loop step: {loop_ms:.1f} ms -> step-utilization {util:.2%} "
          f"({'compute-bound, no double-buffering needed' if util >= 0.9 else 'DATA-BOUND'})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="m")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--gt", type=int, default=100)
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--task", default="detect", choices=["detect", "segment"])
    ap.add_argument("--what", default="full",
                    choices=["full", "fwd", "fwdbwd", "fwdbwd_crit",
                             "criterion", "hungarian", "optim", "loader"])
    ap.add_argument("--data", default="",
                    help="loader mode: dataset root (generated in /tmp if empty)")
    ap.add_argument("--bwd", default="xla",
                    choices=["xla", "sorted", "pallas", "window",
                             "concat", "concat_bf16", "chunked", "novalue",
                             "mxu", "tiled", "xla_novalue"])
    ap.add_argument("--losses", default="",
                    help="comma list overriding criterion losses, e.g. vfl,boxes")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", action="store_true",
                    help="chained amortized protocol (defeats the runtime's "
                         "async-readiness under-reporting; see timed_chain)")
    args = ap.parse_args()

    if args.what == "loader":
        profile_loader(args)
        return

    from dfine_tpu.models import build_model
    from dfine_tpu.ops.deform_attn import set_deform_bwd
    from dfine_tpu.train.criterion import CriterionConfig, criterion_forward
    from dfine_tpu.train.optim import OptimConfig, build_optimizer
    from dfine_tpu.train.train_step import TrainState, make_train_step

    set_deform_bwd(args.bwd, allow_wrong_grads=args.bwd in ("novalue", "xla_novalue"))
    segment = args.task == "segment"
    model = build_model(args.size, args.classes, enable_mask_head=segment,
                        dtype=jnp.bfloat16)
    batch = make_batch(args.bs, args.img, args.gt, args.classes, segment=segment)
    base_losses = (tuple(args.losses.split(","))
                   if args.losses else CriterionConfig.__dataclass_fields__["losses"].default)
    if segment and "masks" not in base_losses:
        base_losses = tuple(base_losses) + ("masks",)  # trainer.py:93
    crit = CriterionConfig(num_classes=args.classes, losses=tuple(base_losses))

    from dfine_tpu.models import jit_init

    variables = jit_init(
        model,
        {"params": jax.random.key(0), "dn": jax.random.key(1)},
        batch["images"][:1], jax.tree.map(lambda x: x[:1], batch["targets"]),
        train=True,
    )
    tx = build_optimizer(variables["params"], OptimConfig(steps_per_epoch=100, epochs=10))

    if args.what == "full":
        state = TrainState.create(variables, tx)
        step = jax.jit(make_train_step(model, tx, crit), donate_argnums=(0,))

        def run(state, batch, key):
            s, m = step(state, batch, key)
            return s, m

        # donation: rebuild state each call is wrong; loop manually
        for _ in range(2):
            state, m = step(state, batch, jax.random.key(2))
        jax.block_until_ready(m)
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            state, m = step(state, batch, jax.random.key(3 + i))
            jax.block_until_ready(m)
            times.append(time.perf_counter() - t0)
        times.sort()
        ms = float(np.mean(times[: max(1, len(times) // 2)]) * 1000.0)
        print(f"full train step ({args.size}@{args.img} bs{args.bs} gt{args.gt}, "
              f"bwd={args.bwd}): {ms:.1f} ms -> {args.bs / ms * 1000:.1f} img/s")
    elif args.what == "fwd":
        # train-mode FORWARD alone (chained; feedback touches every output
        # leaf) — baseline for decomposing fwd+bwd into fwd / scatter / rest
        @jax.jit
        def step(x, fb):
            imgs = batch["images"] + fb * 1e-30
            out, _ = model.apply(
                variables, imgs, batch["targets"], train=True,
                rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"],
            )
            return sum(
                v.astype(jnp.float32).sum()
                for v in jax.tree.leaves(out)
                if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.inexact)
            )

        ms = timed_chain(step, None, jnp.float32(0.0), iters=args.iters)
        print(f"model fwd train-mode (chained): {ms:.1f} ms")
    elif args.what == "fwdbwd":
        def loss_fn(params, bs_, batch, key):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs_}, batch["images"],
                batch["targets"], train=True, rngs={"dn": key},
                mutable=["batch_stats"],
            )
            # trivial loss: every float output leaf contributes
            return sum(
                jnp.sum(v.astype(jnp.float32) ** 2)
                for v in jax.tree.leaves(out)
                if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.inexact)
            )

        if args.chain:
            @jax.jit
            def step(x, fb):
                imgs = batch["images"] + fb * 1e-30
                gr = jax.grad(loss_fn)(
                    variables["params"], variables.get("batch_stats", {}),
                    {**batch, "images": imgs}, jax.random.key(2),
                )
                # depend on EVERY grad leaf so none is dead-code-eliminated
                # (returning just gr[0] lets XLA drop most of the backward —
                # the r3 "11.8 ms fwd+bwd" artifact, see NOTES.md)
                return sum(
                    g.astype(jnp.float32).sum() for g in jax.tree.leaves(gr)
                )

            ms = timed_chain(step, None, jnp.float32(0.0), iters=args.iters)
            proto = "chained"
        else:
            g = jax.jit(jax.grad(loss_fn))
            ms = timed(g, variables["params"], variables.get("batch_stats", {}),
                       batch, jax.random.key(2), iters=args.iters)
            proto = "per-call"
        print(f"model fwd+bwd trivial-loss (bwd={args.bwd}, {proto}): {ms:.1f} ms")
    elif args.what == "fwdbwd_crit":
        # the true training gradient: model + criterion (no optimizer/EMA)
        def loss_fn(params, bs_, batch, key):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs_}, batch["images"],
                batch["targets"], train=True, rngs={"dn": key},
                mutable=["batch_stats"],
            )
            return criterion_forward(out, batch["targets"], crit)["total"]

        if args.chain:
            bs0 = variables.get("batch_stats", {})
            key0 = jax.random.key(2)

            @jax.jit
            def step(params, fb):
                p = jax.tree.map(lambda x: x, params)
                first = jax.tree.leaves(p)[0]
                p = jax.tree.map(
                    lambda x: x + fb * 1e-30 if x is first else x, p
                )
                gr = jax.grad(loss_fn)(p, bs0, batch, key0)
                # depend on EVERY grad leaf so none is dead-code-eliminated
                return sum(
                    g.astype(jnp.float32).sum() for g in jax.tree.leaves(gr)
                )

            ms = timed_chain(step, variables["params"], jnp.float32(0.0),
                             iters=args.iters)
            proto = "chained"
        else:
            g = jax.jit(jax.grad(loss_fn))
            ms = timed(g, variables["params"], variables.get("batch_stats", {}),
                       batch, jax.random.key(2), iters=args.iters)
            proto = "per-call"
        print(f"model+criterion fwd+bwd (bwd={args.bwd}, {proto}): {ms:.1f} ms")
    elif args.what == "criterion":
        out, _ = model.apply(
            variables, batch["images"], batch["targets"], train=True,
            rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"],
        )
        out = jax.tree.map(jax.lax.stop_gradient, out)
        # grad only w.r.t. float leaves (outputs carry int dn metadata)
        flt, aux = jax.tree_util.tree_flatten(out)
        is_f = [hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.inexact) for v in flt]

        def crit_loss(fleaves, targets):
            leaves = []
            fi = iter(fleaves)
            for v, f in zip(flt, is_f):
                leaves.append(next(fi) if f else v)
            o = jax.tree_util.tree_unflatten(aux, leaves)
            return criterion_forward(o, targets, crit)["total"]

        fleaves = [v for v, f in zip(flt, is_f) if f]
        if args.chain:
            @jax.jit
            def step(x, fb):
                fl = [fleaves[0] + fb * 1e-30] + fleaves[1:]
                gr = jax.grad(crit_loss)(fl, batch["targets"])
                # depend on EVERY grad so none is dead-code-eliminated
                return sum(g.astype(jnp.float32).sum() for g in gr)

            ms = timed_chain(step, None, jnp.float32(0.0), iters=args.iters)
            proto = "chained"
        else:
            g = jax.jit(jax.grad(crit_loss))
            ms = timed(g, fleaves, batch["targets"], iters=args.iters)
            proto = "per-call"
        print(f"criterion fwd+bwd (incl. Hungarian, {proto}): {ms:.1f} ms")
    elif args.what == "hungarian":
        # matcher alone on REAL model-output costs (cost stats drive the
        # augmenting-path lengths, so random-cost micro-benchmarks mislead)
        from dfine_tpu.matcher import matching_cost, solve_matchings

        out, _ = model.apply(
            variables, batch["images"], batch["targets"], train=True,
            rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"],
        )
        sets = [out] + list(out.get("aux_outputs", [])) + [out["pre_outputs"]]
        sets += list(out.get("enc_aux_outputs", []))
        tgt = batch["targets"]
        costs = jnp.stack([
            matching_cost(s["pred_logits"], s["pred_boxes"], tgt["labels"],
                          tgt["boxes"], tgt["valid"], crit.matcher)
            for s in sets
        ])
        costs = jax.block_until_ready(jax.lax.stop_gradient(costs))
        if args.chain:
            @jax.jit
            def step(c, fb):
                m, gq, gt_, gv = solve_matchings(c + fb * 1e-30, tgt["valid"])
                return m.astype(jnp.float32).sum()

            ms = timed_chain(step, costs, jnp.float32(0.0), iters=args.iters)
            proto = "chained"
        else:
            f = jax.jit(lambda c: solve_matchings(c, tgt["valid"]))
            ms = timed(f, costs, iters=args.iters)
            proto = "per-call"
        print(f"matcher (solve_matchings, {costs.shape[0]}x{costs.shape[1]} "
              f"problems of {costs.shape[2]}x{costs.shape[3]}, {proto}): {ms:.1f} ms")
    elif args.what == "optim":
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, variables["params"])
        state = tx.init(variables["params"])

        @jax.jit
        def step(grads, state, params):
            import optax

            ups, st = tx.update(grads, state, params)
            return optax.apply_updates(params, ups), st

        ms = timed(step, grads, state, variables["params"], iters=args.iters)
        print(f"optimizer update+apply: {ms:.1f} ms")


if __name__ == "__main__":
    main()
