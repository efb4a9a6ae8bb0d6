from .dfine import DFINE, build_model  # noqa: F401


def jit_init(model, rngs, *args, **kwargs):
    """``model.init`` under ``jax.jit``: one compiled program instead of
    thousands of eager per-op mini-compiles.

    With a cold XLA compilation cache, eager flax init dispatches every op
    shape separately — measured 340 s for the *smallest* model (n@320) over
    the axon tunnel vs 26 s jitted (2026-08-18).  Always init through this
    on a real device; plain ``model.init`` is fine on CPU tests.
    """
    import jax

    fn = jax.jit(lambda r, a: model.init(r, *a, **kwargs))
    return fn(rngs, args)
