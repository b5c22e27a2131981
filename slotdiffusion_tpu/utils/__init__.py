from .config import BaseParams, apply_overrides, load_params
from .misc import (
    AverageMeter,
    dump_obj,
    glob_all,
    load_obj,
    mkdir_or_exist,
    read_all_lines,
    to_rgb_from_tensor,
)

__all__ = [
    "BaseParams",
    "apply_overrides",
    "load_params",
    "AverageMeter",
    "load_obj",
    "dump_obj",
    "glob_all",
    "mkdir_or_exist",
    "read_all_lines",
    "to_rgb_from_tensor",
]
