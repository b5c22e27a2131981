"""File-level importer for the reference's torch modules (parity tests).

The reference (/root/reference, torch) is the behavioral contract; these
tests import its actual modules and assert numeric agreement with the JAX
rebuild. Only torch-importable leaf modules are loaded; the few external
deps the reference assumes (nerv, lpips, torchvision, pycocotools) are
stubbed with inert placeholders — the code paths under test never call
them.

Registered package: `refmodels` -> /root/reference/slotdiffusion/
video_based/models, imported WITHOUT executing models/__init__.py (which
pulls the full nerv training stack). Submodules like
`refmodels.ddpm.utils`, `refmodels.vqvae.quantize`, `refmodels.unet.unet`
import normally with their relative imports intact.
"""

import importlib
import importlib.machinery
import importlib.util
import sys
import types

REF_MODELS = "/root/reference/slotdiffusion/video_based/models"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec: libraries probing availability with
    # importlib.util.find_spec (e.g. transformers) raise ValueError on a
    # module whose __spec__ is None
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    import torch
    from torch import nn

    tv = _stub_module("torchvision")
    tv.utils = _stub_module(
        "torchvision.utils", make_grid=lambda *a, **k: None)
    tv.ops = _stub_module("torchvision.ops",
                          masks_to_boxes=lambda *a, **k: None)

    nerv = _stub_module("nerv")
    nerv.training = _stub_module("nerv.training", BaseModel=nn.Module)
    nerv.utils = _stub_module("nerv.utils")

    def _nerv_unavailable(*a, **k):
        raise NotImplementedError(
            "external helper not installed in this image; parity tests "
            "only exercise code paths that never call it")

    # nerv.models conv helpers, reconstructed from the reference's pinned
    # usage (SURVEY.md §2.1; img_based/models/slot_attention.py:225-235,
    # 259-272): conv_norm_act = Conv2d(padding=k//2) -> (norm) -> (act);
    # deconv_norm_act = ConvTranspose2d(padding=k//2, output_padding=s-1)
    # -> (norm) -> (act) — the only arithmetic consistent with the
    # reference's own deconv_out_shape(out, s, k//2, k, s-1) call. The SA
    # configs all use norm='' ; other norms are out of parity scope.
    def _conv_norm_act(in_ch, out_ch, kernel_size=3, stride=1, norm="",
                       act="relu"):
        assert norm in ("",), f"norm={norm!r} not covered by the shim"
        layers = [nn.Conv2d(in_ch, out_ch, kernel_size, stride,
                            padding=kernel_size // 2)]
        if act == "relu":
            layers.append(nn.ReLU())
        else:
            assert act == "", f"act={act!r} not covered by the shim"
        return nn.Sequential(*layers)

    def _deconv_norm_act(in_ch, out_ch, kernel_size=3, stride=1, norm="",
                         act="relu"):
        assert norm in ("",), f"norm={norm!r} not covered by the shim"
        layers = [nn.ConvTranspose2d(in_ch, out_ch, kernel_size, stride,
                                     padding=kernel_size // 2,
                                     output_padding=stride - 1)]
        if act == "relu":
            layers.append(nn.ReLU())
        else:
            assert act == "", f"act={act!r} not covered by the shim"
        return nn.Sequential(*layers)

    def _deconv_out_shape(in_size, stride, padding, kernel_size,
                          out_padding):
        if isinstance(in_size, (tuple, list)):
            return type(in_size)(
                _deconv_out_shape(s, stride, padding, kernel_size,
                                  out_padding) for s in in_size)
        return (in_size - 1) * stride - 2 * padding + kernel_size \
            + out_padding

    nerv.models = _stub_module(
        "nerv.models", conv_norm_act=_conv_norm_act,
        deconv_norm_act=_deconv_norm_act,
        deconv_out_shape=_deconv_out_shape)

    # eval_utils.py imports skimage.metrics at module level (not installed
    # in this image); the metric fns are never called by parity tests
    sk = _stub_module("skimage")
    sk.metrics = _stub_module(
        "skimage.metrics", structural_similarity=_nerv_unavailable,
        peak_signal_noise_ratio=_nerv_unavailable)

    class _LPIPSStub(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x, y):
            return torch.zeros(x.shape[0])

    _stub_module("lpips", LPIPS=_LPIPSStub)


def load_ref_package():
    """Return the `refmodels` namespace package over the reference models
    dir; submodules are imported lazily via importlib."""
    if "refmodels" in sys.modules:
        return sys.modules["refmodels"]
    _install_stubs()
    spec = importlib.machinery.ModuleSpec(
        "refmodels", None, origin=REF_MODELS, is_package=True)
    spec.submodule_search_locations = [REF_MODELS]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refmodels"] = pkg
    return pkg


REF_VP_MODELS = "/root/reference/slotdiffusion/vp_vqa/models"


def _install_video_models_alias():
    """Register `slotdiffusion.video_based.models` as an importable package
    over the reference models dir — img_based and vp_vqa modules re-export
    through ABSOLUTE imports of that path (img resnet.py:1,
    ldm_slotformer.py:10-11)."""
    if "slotdiffusion.video_based.models" in sys.modules:
        return
    _stub_module("slotdiffusion")
    _stub_module("slotdiffusion.video_based")
    spec = importlib.machinery.ModuleSpec(
        "slotdiffusion.video_based.models", None, origin=REF_MODELS,
        is_package=True)
    spec.submodule_search_locations = [REF_MODELS]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["slotdiffusion.video_based.models"] = pkg


def load_ref_vp_package():
    """Same as load_ref_package but over the vp_vqa models tree
    (slotformer.py, readout.py, ldm_slotformer.py)."""
    if "refvpmodels" in sys.modules:
        return sys.modules["refvpmodels"]
    _install_stubs()
    _install_video_models_alias()
    spec = importlib.machinery.ModuleSpec(
        "refvpmodels", None, origin=REF_VP_MODELS, is_package=True)
    spec.submodule_search_locations = [REF_VP_MODELS]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refvpmodels"] = pkg
    return pkg


def ref_vp_import(submodule):
    """Import e.g. 'slotformer' under the refvpmodels package."""
    load_ref_vp_package()
    return importlib.import_module(f"refvpmodels.{submodule}")


REF_IMG_MODELS = "/root/reference/slotdiffusion/img_based/models"


def load_ref_img_package():
    """Same as load_ref_package but over the img_based models tree
    (slot_attention.py with the full SA model, sa_diffusion.py, slate)."""
    if "refimgmodels" in sys.modules:
        return sys.modules["refimgmodels"]
    _install_stubs()
    _install_video_models_alias()
    spec = importlib.machinery.ModuleSpec(
        "refimgmodels", None, origin=REF_IMG_MODELS, is_package=True)
    spec.submodule_search_locations = [REF_IMG_MODELS]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refimgmodels"] = pkg
    return pkg


def ref_img_import(submodule):
    """Import e.g. 'slot_attention' under the refimgmodels package."""
    load_ref_img_package()
    return importlib.import_module(f"refimgmodels.{submodule}")


def ref_import(submodule):
    """Import e.g. 'ddpm.utils' under the refmodels package."""
    load_ref_package()
    return importlib.import_module(f"refmodels.{submodule}")
