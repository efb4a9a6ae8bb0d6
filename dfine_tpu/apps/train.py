"""`make train` entry point: python -m dfine_tpu.apps.train [cfg.yaml] [k=v ...]

No torchrun/DDP launcher needed: the single JAX controller drives every
TPU chip via the mesh (enable with train.dp.enabled=true)."""

from dfine_tpu.train.trainer import main

if __name__ == "__main__":
    main()
