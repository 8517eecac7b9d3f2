"""gdrnpp_bop2022_tpu — a TPU-native 6D object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the GDRNPP BOP-2022 system
(reference: shanice-l/gdrnpp_bop2022): a YOLOX 2D detector (stage 1) feeding a
geometry-guided direct regression pose network (stage 2), with BOP-format
datasets, evaluation, and depth-based refinement.

Design stance (TPU-first, not a port):
  * single pure-functional compute core — every hot path is batched,
    static-shaped, and jit-able (models, losses, pose decode, rasterizer,
    PnP, augmentations);
  * NHWC layouts and bf16-friendly compute for the MXU;
  * scaling via ``jax.sharding.Mesh`` + NamedSharding data/fsdp parallelism
    (replacing the reference's NCCL/DDP/horovod matrix);
  * the reference's native CUDA/EGL extensions (renderer, fps, PnP, chamfer,
    ransac voting) become batched JAX/Pallas device ops.
"""

__version__ = "0.1.0"
