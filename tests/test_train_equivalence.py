"""Multi-step train-from-same-init equivalence with the torch reference.

Single-batch loss/gradient parity (test_criterion_parity / test_train_parity)
pins one step; this locks the full OPTIMIZATION TRAJECTORY: starting from
identical weights and feeding identical batches, our jitted train step and a
reference torch loop (model + DFINECriterion + AdamW) must produce matching
per-step losses over dozens of steps — the "train-from-same-init equivalence
over more steps" called for by the r1 review.

Controlled setup: num_denoising=0 (no CDN rng), fp32 both sides, plain AdamW
(identical decoupled weight-decay semantics in torch and optax), no clip, no
EMA, fixed synthetic batches.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import build_reference_model, _install_stubs

STEPS = 30
LR = 1e-4
WD = 1e-4
BS, IMG, G, C = 2, 320, 4, 5


def _batches(n):
    rng = np.random.default_rng(42)
    out = []
    for _ in range(n):
        imgs = rng.uniform(size=(BS, IMG, IMG, 3)).astype(np.float32)
        boxes = rng.uniform(0.3, 0.7, size=(BS, G, 4)).astype(np.float32)
        boxes[..., 2:] = np.clip(boxes[..., 2:] * 0.4, 0.08, 0.3)
        labels = rng.integers(0, C, size=(BS, G)).astype(np.int64)
        valid = np.tile(np.arange(G)[None] < 2, (BS, 1))
        out.append((imgs, boxes, labels, valid))
    return out


@pytest.mark.slow
def test_same_init_training_trajectories_match():
    import torch

    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.d_fine.dfine_criterion import DFINECriterion
    from src.d_fine.matcher import HungarianMatcher

    torch.manual_seed(0)
    ref = build_reference_model("n", C)
    ref.decoder.num_denoising = 0
    ref.train()
    crit = DFINECriterion(
        HungarianMatcher({"cost_class": 2, "cost_bbox": 5, "cost_giou": 2},
                         use_focal_loss=True, alpha=0.25, gamma=2.0),
        weight_dict={"loss_vfl": 1, "loss_bbox": 5, "loss_giou": 2,
                     "loss_fgl": 0.15, "loss_ddf": 1.5},
        losses=["vfl", "boxes", "local"], alpha=0.75, gamma=2.0,
        num_classes=C, reg_max=32,
    )
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)

    # ---- ours, importing the reference's initial weights
    import optax

    from dfine_tpu.models import build_model
    from dfine_tpu.train.criterion import CriterionConfig, criterion_forward
    from dfine_tpu.utils.checkpoint import load_torch_checkpoint

    model = build_model("n", C, cfg_overrides=(("decoder.num_denoising", 0),))
    x0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    t0 = {
        "labels": jnp.zeros((1, G), jnp.int32),
        "boxes": jnp.full((1, G, 4), 0.5, jnp.float32),
        "valid": jnp.ones((1, G), bool),
    }
    template = model.init(
        {"params": jax.random.key(0), "dn": jax.random.key(1)}, x0, t0, train=True
    )
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, load_torch_checkpoint(sd, template))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD)
    opt_state = tx.init(params)
    ccfg = CriterionConfig(num_classes=C)

    @jax.jit
    def step(params, batch_stats, opt_state, images, targets):
        def loss_fn(p, bs_):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs_}, images, targets, train=True,
                rngs={"dn": jax.random.key(9)}, mutable=["batch_stats"],
            )
            l = criterion_forward(out, targets, ccfg)
            return l["total"], mut["batch_stats"]

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        ups, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, ups), new_bs, opt_state, total

    losses_ref, losses_ours = [], []
    # cycle 6 distinct batches so the models see each 5x — a clear
    # memorization signal at this lr (fresh batches every step would leave
    # the "did it train" check at noise level after 30 steps)
    cycle = _batches(6)
    for step_i in range(STEPS):
        imgs, boxes, labels, valid = cycle[step_i % len(cycle)]
        # ---- torch step
        t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        t_targets = [
            {"labels": torch.from_numpy(labels[i][valid[i]]),
             "boxes": torch.from_numpy(boxes[i][valid[i]])}
            for i in range(BS)
        ]
        out = ref(t_imgs, targets=t_targets)
        loss_t = sum(crit(out, t_targets).values())
        opt.zero_grad()
        loss_t.backward()
        opt.step()
        losses_ref.append(float(loss_t.detach()))

        # ---- our step
        targets = {
            "labels": jnp.asarray(labels.astype(np.int32)),
            "boxes": jnp.asarray(boxes),
            "valid": jnp.asarray(valid),
        }
        params, batch_stats, opt_state, total = step(
            params, batch_stats, opt_state, jnp.asarray(imgs), targets
        )
        losses_ours.append(float(total))

    losses_ref = np.asarray(losses_ref)
    losses_ours = np.asarray(losses_ours)
    rel = np.abs(losses_ours - losses_ref) / np.abs(losses_ref)
    print("ref  losses:", np.array2string(losses_ref, precision=4))
    print("ours losses:", np.array2string(losses_ours, precision=4))
    print("rel diff   :", np.array2string(rel, precision=5))
    # The first steps must track BIT-TIGHT (identical math end to end).
    # Beyond that, ~1e-4 weight drift eventually crosses a decision boundary
    # in the DISCRETE Hungarian matching / top-k selection and the loss
    # values step apart (measured: steps 1-4 at rel <= 1.4e-4, step 5 flips
    # a matching) — the same would happen to the reference vs an epsilon-
    # perturbed copy of itself, so only statistical tracking is guaranteed
    # afterwards.
    assert rel[:4].max() < 0.005, (rel[:4], losses_ref[:4], losses_ours[:4])
    assert rel.mean() < 0.05, (rel.mean(), rel)
    assert rel[-5:].mean() < 0.10, (rel[-5:], losses_ref[-5:], losses_ours[-5:])
    # both must actually train: loss on the FIRST batch re-evaluated with the
    # final weights must beat its initial value on both sides (per-step
    # losses are on fresh random batches, so the raw curve is noisy)
    imgs0, boxes0, labels0, valid0 = _batches(1)[0]
    t_imgs = torch.from_numpy(imgs0.transpose(0, 3, 1, 2))
    t_targets = [
        {"labels": torch.from_numpy(labels0[i][valid0[i]]),
         "boxes": torch.from_numpy(boxes0[i][valid0[i]])}
        for i in range(BS)
    ]
    out = ref(t_imgs, targets=t_targets)
    final_ref = float(sum(crit(out, t_targets).values()).detach())
    targets0 = {
        "labels": jnp.asarray(labels0.astype(np.int32)),
        "boxes": jnp.asarray(boxes0),
        "valid": jnp.asarray(valid0),
    }
    out0, _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(imgs0),
        targets0, train=True, rngs={"dn": jax.random.key(9)},
        mutable=["batch_stats"],
    )
    final_ours = float(criterion_forward(out0, targets0, ccfg)["total"])
    print(f"batch0 loss: init ref={losses_ref[0]:.4f}  "
          f"final ref={final_ref:.4f}  final ours={final_ours:.4f}")
    assert final_ref < losses_ref[0]
    assert final_ours < losses_ours[0]
    # and the two end states agree on the same batch
    assert abs(final_ours - final_ref) / final_ref < 0.10
