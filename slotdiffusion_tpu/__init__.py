"""slotdiffusion_tpu — a TPU-native JAX framework for unsupervised
object-centric learning with diffusion decoders.

Re-implements the capabilities of SlotDiffusion (NeurIPS'23,
reference: Wuziyi616/SlotDiffusion) idiomatically for TPU:

- flax.linen modules, NHWC image layout, explicit `jax.random` keys
- `lax.scan` for every sequential loop (SA iterations, video frames,
  diffusion sampling steps, autoregressive token generation)
- a fused Pallas kernel for the Slot Attention inner loop
- pjit/`jax.sharding` data-parallel training over an ICI mesh in place
  of PyTorch DDP (reference: scripts/train.py:89, docs/benchmark.md:35)
- optax + orbax replacing the external `nerv` trainer
  (reference: docs/install.md:19-27)
"""

__version__ = "0.1.0"
