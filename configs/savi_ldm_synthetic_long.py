"""savi_ldm_synthetic at more optimization steps (drive-evidence run).

Same model/data as savi_ldm_synthetic_params-res64; only the schedule is
longer so the committed train log shows a real denoise-loss descent and
epoch-end visual logging across many epochs. Train with
`--ckp_path checkpoint/savi_ldm_synthetic_params-res64` to refresh the
committed artifacts.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "savi_ldm_synthetic_params_res64",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "savi_ldm_synthetic_params-res64.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


class SlotAttentionParams(_mod.SlotAttentionParams):
    max_epochs = 25
    eval_interval = 5
