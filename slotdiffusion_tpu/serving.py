"""AOT model export for serving: serialize jitted inference callables to
portable StableHLO artifacts via `jax.export`.

A TPU-native deployment capability with no reference analog (the torch
reference serves nothing; its eval scripts re-import the full model code):
an exported artifact reloads and executes with ONLY jax installed — no
model classes, no configs, no checkpoint loading — and can be lowered for
platforms the exporting host doesn't have (export for TPU from a CPU box).

Serving surfaces (scripts/export_model.py):

- ``encode``  img [B, H, W, 3] (or [B, T, H, W, 3] video) -> (slots, masks)
  — object-centric segmentation serving.
- ``sample``  (seed, slots) -> imgs — slot-conditioned generation through
  the DPM-Solver chain (+ VQ decode for LDM), the reference's
  `log_images` path as one compiled program.
- ``denoise`` (x_t, t, slots) -> model output — the raw UNet step, the
  building block for custom samplers at the serving edge.

Artifact format: one file, a JSON header line (argument shapes/dtypes +
caller metadata) followed by the raw `jax.export` serialization.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

_MAGIC = "slotdiffusion-tpu-export-v1"


def export_fn(fn, example_args, platforms=None):
    """Lower `fn` (traced at example_args' shapes/dtypes) -> serialized
    bytes. `platforms` e.g. ("tpu", "cpu") enables cross-platform
    lowering; None exports for the default backend only."""
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tuple(example_args))
    exp = jexport.export(jax.jit(fn), platforms=platforms)(*specs)
    return exp.serialize()


def save_artifact(path, fn, example_args, meta=None, platforms=None):
    """Export `fn` and write the artifact file; returns the header dict."""
    blob = export_fn(fn, example_args, platforms=platforms)
    header = {
        "magic": _MAGIC,
        "meta": meta or {},
        "platforms": list(platforms) if platforms else None,
        "args": [
            {"shape": list(np.shape(a)),
             "dtype": str(np.asarray(a).dtype)}
            for a in example_args
        ],
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write((json.dumps(header) + "\n").encode())
        f.write(blob)
    return header


def load_artifact(path):
    """-> (callable, header). The callable runs the exported program on
    the current default backend; only jax is required."""
    with open(path, "rb") as f:
        header = json.loads(f.readline().decode())
        if header.get("magic") != _MAGIC:
            raise ValueError(f"{path} is not a slotdiffusion-tpu export")
        exp = jexport.deserialize(f.read())
    return exp.call, header


def build_serving_fn(model, variables, what, data_shape):
    """-> (fn, example_args) for one serving surface of a built model.

    `variables` should hold the weights to ship (load with
    training/checkpoint.py:load_model_params, which already swaps in the
    EMA shadow for the DM decoder). `data_shape` is the full batched
    input shape: [B, H, W, 3] images / [B, T, H, W, 3] video for
    ``encode``/``sample``; the latent/pixel x_t shape for ``denoise``.
    """
    if what == "encode":
        def fn(img):
            out = model.apply(variables, {"img": img}, train=False,
                              testing=True)
            return out["slots"], out["masks"]

        return fn, (jnp.zeros(data_shape, jnp.float32),)

    # slots shape: run a tiny encode trace to get [B(, T), N, C] cheaply
    probe = jax.eval_shape(
        lambda img: model.apply(variables, {"img": img}, train=False),
        jax.ShapeDtypeStruct(tuple(data_shape), jnp.float32))
    slots_shape = tuple(probe["slots"].shape)

    if what == "sample":
        def _sample(m, seed, slots):
            cond = slots
            if cond.ndim == 4:  # video: fold T into batch like the models
                cond = cond.reshape(-1, *cond.shape[2:])
            rng = jax.random.PRNGKey(seed)
            x = m.dm_decoder.generate_imgs(rng, cond=cond, use_dpm=True)
            if hasattr(m.dm_decoder, "decode_latent"):
                x = m.dm_decoder.decode_latent(x)
            if slots.ndim == 4:
                x = x.reshape(*slots.shape[:2], *x.shape[1:])
            return x

        def fn(seed, slots):
            return model.apply(variables, seed, slots, method=_sample)

        return fn, (jnp.int32(0), jnp.zeros(slots_shape, jnp.float32))

    if what == "denoise":
        def _denoise(m, x, t, slots):
            cond = slots
            if cond.ndim == 4:
                cond = cond.reshape(-1, *cond.shape[2:])
            return m.dm_decoder.denoise(x, t, context=cond, train=False)

        dm = model.dec_dict
        res = tuple(dm.get("resolution", model.resolution))
        ch = dm["unet_dict"].get("in_channels", 3)
        B = int(np.prod(slots_shape[:-2]))
        x = jnp.zeros((B, *res, ch), jnp.float32)
        t = jnp.zeros((B,), jnp.int32)

        def fn(x, t, slots):
            return model.apply(variables, x, t, slots, method=_denoise)

        return fn, (x, t, jnp.zeros(slots_shape, jnp.float32))

    raise ValueError(f"unknown serving surface {what!r}")
