"""mmearth_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
vishalned/MMEarth-train (MP-MAE: FCMAE pretraining of ConvNeXtV2 on multi-modal
MMEarth + GEO-Bench finetuning).

This is a from-scratch TPU-first rebuild, not a port:
  * NHWC everywhere, bf16 compute policy, one jitted train step.
  * The MinkowskiEngine sparse encoder is replaced by an exactly-equivalent
    dense masked path (mask re-applied after every spatial op, masked GRN
    statistics) that XLA tiles onto the MXU.
  * DDP/NCCL is replaced by a `jax.sharding.Mesh` + pjit; gradients are averaged
    by XLA-inserted collectives over ICI.
  * FFCV is replaced by an offline packer + memory-mapped loader.
"""

__version__ = "0.1.0"
