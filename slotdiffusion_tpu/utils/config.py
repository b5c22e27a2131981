"""Config system.

Configs are importable Python classes holding an attribute bag, following the
reference's pattern of `class SlotAttentionParams(BaseParams)` selected by a
`--params` file path (reference: scripts/train.py:102-107). Nested dicts
(`slot_dict`, `enc_dict`, `dec_dict`, `unet_dict`, `vae_dict`,
`diffusion_dict`, ...) are passed verbatim into model constructors
(reference: video_based/models/__init__.py:14-23). Scripts may freely mutate
params after load (reference: test_recon.py:203-208), so this is a plain
mutable attribute bag, not a frozen dataclass.
"""

import copy
import importlib.util
import os
import sys


class BaseParams:
    """Mutable attribute-bag config base class.

    Mirrors the behavior the reference gets from `nerv.training.BaseParams`
    (usage: every config file; `.get()` at img_based/method.py:248).
    Class attributes defined on subclasses act as defaults; instances can be
    mutated freely after construction (`params.ddp = args.ddp` pattern).
    """

    project = "SlotDiffusionTPU"

    def __init__(self, **overrides):
        for k, v in overrides.items():
            setattr(self, k, v)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def has(self, key):
        return hasattr(self, key)

    def keys(self):
        keys = []
        for klass in reversed(type(self).__mro__):
            for k in vars(klass):
                if not k.startswith("_") and not callable(getattr(self, k)):
                    if k not in keys:
                        keys.append(k)
        for k in vars(self):
            if not k.startswith("_") and k not in keys:
                keys.append(k)
        return keys

    def to_dict(self):
        return {k: copy.deepcopy(getattr(self, k)) for k in self.keys()}

    def __repr__(self):
        lines = [f"{type(self).__name__}("]
        for k in self.keys():
            lines.append(f"  {k}={getattr(self, k)!r},")
        lines.append(")")
        return "\n".join(lines)


def apply_overrides(params, overrides):
    """Apply `KEY=VALUE` override strings to params (values parse as
    Python literals, falling back to strings) — the CLI analog of the
    reference scripts' post-load params mutation (test_recon.py:203-208).
    Shared by every script exposing `--set`."""
    import ast
    for kv in overrides:
        key, sep, raw = kv.partition("=")
        if not sep:
            raise ValueError(f"--set expects KEY=VALUE, got {kv!r}")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        setattr(params, key, value)
    return params


def load_params(params_path, cls_name="SlotAttentionParams"):
    """Load a params class instance from a Python config file path.

    Mirrors reference scripts/train.py:102-107: the config file defines a
    class with a fixed name regardless of the model it configures.
    """
    params_path = os.path.abspath(params_path)
    if not os.path.isfile(params_path):
        raise FileNotFoundError(params_path)
    mod_name = os.path.splitext(os.path.basename(params_path))[0].replace(
        "-", "_")
    spec = importlib.util.spec_from_file_location(mod_name, params_path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = module
    spec.loader.exec_module(module)
    if hasattr(module, cls_name):
        return getattr(module, cls_name)()
    # fall back: find the unique BaseParams subclass in the file
    candidates = [
        v for v in vars(module).values()
        if isinstance(v, type) and issubclass(v, BaseParams)
        and v is not BaseParams
    ]
    if len(candidates) != 1:
        raise ValueError(
            f"Config {params_path} must define `{cls_name}` or exactly one "
            f"BaseParams subclass; found {len(candidates)}.")
    return candidates[0]()
