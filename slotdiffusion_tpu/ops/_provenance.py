"""Shared weight-provenance labeling for metric nets (FID/FVD/LPIPS).

Converted-from-a-real-torch-state-dict npz files carry
``__source_sha256__`` (written by each module's converter), so printed
metric headlines are auditable. Random/replica npz files (no provenance)
must NEVER print as the bare metric (VERDICT r3) — they label
``{name}(untrained-weights)``.

Factored out of fid.py/fvd.py/lpips.py (ADVICE r4): one implementation,
with the pinned upstream sha prefix passed per caller — ``None``
documents that no published hash exists (I3D).
"""

import hashlib

import numpy as np


def file_sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def weights_label(name, weights_path, pinned_sha_prefix=None):
    """Provenance-label a metric headline.

    - no ``__source_sha256__`` in the npz → ``{name}(untrained-weights)``
    - source sha present but not matching ``pinned_sha_prefix`` →
      ``{name}[UNVERIFIED src=<sha8>]`` (converted, auditable, unknown
      origin)
    - matching (or no pin published, ``pinned_sha_prefix=None``) →
      ``{name}[src=<sha8>]``
    """
    sha = ""
    try:
        data = np.load(weights_path)
        if "__source_sha256__" in getattr(data, "files", []):
            sha = str(data["__source_sha256__"])
    except Exception:
        pass
    if not sha:
        return f"{name}(untrained-weights)"
    if pinned_sha_prefix is not None and not sha.startswith(
            pinned_sha_prefix):
        return f"{name}[UNVERIFIED src={sha[:8]}]"
    return f"{name}[src={sha[:8]}]"
