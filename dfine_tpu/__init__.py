"""dfine_tpu — a TPU-native (JAX/XLA/Pallas) re-design of the D-FINE-seg framework.

Capability parity target: the reference train->export->deploy pipeline for
D-FINE object detection + instance segmentation (reference: /root/reference,
see SURVEY.md).  All compute paths are JAX (flax/optax/pallas); the runtime
around them (data pipeline, matcher LAPJV, RLE codec) uses host-native code
where the reference bottomed out in native libraries.

Layout conventions (TPU-first, NOT a torch translation):
  * images and feature maps are NHWC (XLA:TPU's native conv layout)
  * compute dtype is bfloat16 by default with fp32 params & losses
  * all training shapes are static: GT is padded to ``max_gt`` per image
"""

__version__ = "0.1.0"
