"""Checkpoint IO and frozen-submodule surgery.

Orbax-based save/restore lives on the Trainer; this module adds the
cross-stage reuse the reference does with path-based `.pth` loading and
prefix stripping (SURVEY.md §5: VQVAE.py:166-178, ldm_slotformer.py:124-129):

- `load_model_params`: restore a Trainer checkpoint and return `{'params'}`
  variables for eval scripts; prefers EMA weights when present.
- `load_pretrained_subtree`: graft a previously-trained model's params into
  a submodule subtree of a bigger model (VQ-VAE -> LDM.vae,
  dVAE -> STEVE.dvae, LDM -> LDMSlotFormer.dm_decoder).
"""

import os

import jax
import numpy as np


def _restore_raw(path):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_train_state(path):
    """Restore a raw TrainState dict from an orbax checkpoint dir.

    Legacy upgrades apply here too — resuming training from a pre-`gru_bi`
    checkpoint needs the zero bias injected into params AND into the
    optimizer-state moment trees (zeros_like = correct fresh Adam init).
    """
    return upgrade_legacy_params(_restore_raw(path))


def upgrade_legacy_params(tree):
    """Migrate pre-`gru_bi` slot-attention checkpoints in place.

    The packed GRU gained an input-bias term (full torch.nn.GRUCell
    parameterization); zero bias is numerically identical to the old
    layout, so older checkpoints are upgraded by injecting zeros wherever
    a slot-attention GRU block lacks it. Recurses through lists/tuples as
    well so optimizer-state trees (optax chain tuples) are covered.
    """
    if isinstance(tree, (list, tuple)):
        return type(tree)(upgrade_legacy_params(v) for v in tree)
    if not isinstance(tree, dict):
        return tree
    if "gru_wi" in tree and "gru_bh" in tree and "gru_bi" not in tree:
        tree = dict(tree)
        tree["gru_bi"] = np.zeros_like(np.asarray(tree["gru_bh"]))
        return tree
    return {k: upgrade_legacy_params(v) for k, v in tree.items()}


def load_model_params(model, path, params=None, use_ema=True):
    """-> variables {'params': ...} for `model.apply` from a Trainer ckpt.

    When the checkpoint carries an EMA and the model declares an
    `ema_filter_prefix`, EMA shadows are swapped in for that subtree
    (matching the reference's eval-with-EMA, ddpm.py:133-147).
    """
    raw = _restore_raw(path)
    raw = upgrade_legacy_params(raw)
    p = raw["params"]
    ema = raw.get("ema", None)
    if use_ema and ema is not None and ema.get("shadow") is not None:
        prefix = getattr(model, "ema_filter_prefix", None)
        shadow = ema["shadow"]
        if prefix is None:
            p = shadow
        else:
            p = dict(p)
            if prefix in shadow:
                p[prefix] = shadow[prefix]
    return {"params": p}


def load_pretrained_subtree(variables, ckp_path, dst_path, src_path=""):
    """Graft params from another checkpoint into a subtree.

    Args:
        variables: {'params': tree} of the composite model.
        ckp_path: orbax checkpoint dir of the stage-1 model.
        dst_path: '/'-separated subtree in the composite model, e.g.
            'dm_decoder/vae/vqvae' or 'dvae'.
        src_path: subtree inside the loaded checkpoint ('' = whole tree).

    Returns new variables with the subtree replaced. Raises KeyError on
    structure mismatch.
    """
    raw = upgrade_legacy_params(_restore_raw(ckp_path))
    src = raw["params"] if "params" in raw else raw
    for k in [s for s in src_path.split("/") if s]:
        src = src[k]

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])

    node = params
    keys = [s for s in dst_path.split("/") if s]
    for k in keys[:-1]:
        node = node[k]
    dst = node[keys[-1]]
    # structural check
    dst_paths = {"/".join(str(getattr(p, "key", p)) for p in kp)
                 for kp, _ in jax.tree_util.tree_flatten_with_path(dst)[0]}
    src_paths = {"/".join(str(getattr(p, "key", p)) for p in kp)
                 for kp, _ in jax.tree_util.tree_flatten_with_path(src)[0]}
    missing = dst_paths - src_paths
    if missing:
        raise KeyError(
            f"checkpoint {ckp_path} missing {len(missing)} params for "
            f"subtree {dst_path}: {sorted(missing)[:5]}...")
    def merge(d, s, path=""):
        if isinstance(d, dict):
            return {k: merge(v, s[k], f"{path}/{k}") for k, v in d.items()}
        d_arr, s_arr = np.asarray(d), np.asarray(s)
        if d_arr.shape != s_arr.shape:
            raise ValueError(
                f"shape mismatch at {dst_path}{path}: "
                f"{d_arr.shape} vs {s_arr.shape}")
        return s_arr.astype(d_arr.dtype)

    node[keys[-1]] = merge(dst, src)
    return {"params": params}


def pretrained_specs(cfg):
    """Derive (ckp_path, dst_subtree, src_subtree) graft specs from a
    config's nested dicts — the analog of the reference's ctor-time frozen
    checkpoint loading (VQVAE.py:166-178, steve.py:78-87,
    ldm_slotformer.py:111-134).

    Recognized keys:
        dec_dict.vae_dict.vqvae_ckp_path -> dm_decoder/vae/vqvae
        dec_dict.dm_ckp_path             -> dm_decoder (from a *Diffusion
                                            ckpt's own dm_decoder subtree)
        dvae_dict.dvae_ckp_path          -> dvae
    Empty paths are skipped (stage-1 models trained jointly/from scratch).
    """
    specs = []
    dec = cfg.get("dec_dict") or {}
    vae = dec.get("vae_dict") or {}
    if vae.get("vqvae_ckp_path"):
        specs.append((vae["vqvae_ckp_path"], "dm_decoder/vae/vqvae", ""))
    if dec.get("dm_ckp_path"):
        specs.append((dec["dm_ckp_path"], "dm_decoder", "dm_decoder"))
    dvae = cfg.get("dvae_dict") or {}
    if dvae.get("dvae_ckp_path"):
        specs.append((dvae["dvae_ckp_path"], "dvae", ""))
    return specs


def apply_dino_pretrained(variables):
    """Overlay pretrained DINO ViT weights onto every DINOEncoder subtree.

    The reference loads facebook/dino-vit* from HF at ctor time
    (video_based/models/dino.py:10-59); here weights come from the
    `SLOTDIFFUSION_DINO_WEIGHTS` npz (keys relative to the encoder
    subtree). No-op when the env var is unset or no DINO subtree exists.
    """
    from ..models.dino import load_dino_weights

    params = variables["params"]
    changed = False

    def walk(node):
        nonlocal changed
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k.startswith("DINOEncoder"):
                v, loaded = load_dino_weights(v)
                changed = changed or loaded
            else:
                v = walk(v)
            out[k] = v
        return out

    new_params = walk(params)
    return ({"params": new_params} if changed else variables), changed


def apply_pretrained(variables, cfg):
    """Graft every configured stage-1 checkpoint into `variables`."""
    for ckp_path, dst, src in pretrained_specs(cfg):
        if not os.path.isdir(ckp_path) and not os.path.isfile(ckp_path):
            raise FileNotFoundError(
                f"pretrained checkpoint {ckp_path!r} (for subtree {dst}) "
                f"not found — train the stage-1 model first or clear the "
                f"config path")
        variables = load_pretrained_subtree(variables, ckp_path, dst, src)
    variables, _ = apply_dino_pretrained(variables)
    return variables
