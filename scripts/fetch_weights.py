"""Weight-drop rehearsal: pretrained frozen-net weights -> npz -> verified.

This image has zero egress, so the four pretrained networks the reference
depends on (LPIPS VGG16: video_based/models/vqvae/loss.py:8-46; DINO ViT:
video_based/models/dino.py:10-59; InceptionV3 for FID and I3D for FVD:
docs/benchmark.md, docs/video_based.md:81-90) cannot be downloaded here.
Every converter is already parity-locked against replica-layout state dicts
(tests/test_pretrained_weights.py, tests/test_fid.py, tests/test_fvd.py);
this script makes the future weight drop a ONE-COMMAND operation:

    # on a machine with egress, fetch these exact files:
    #   vgg16-397923af.pth
    #     https://download.pytorch.org/models/vgg16-397923af.pth
    #     (torchvision convention: '397923af' = first 8 hex of sha256)
    #   vgg.pth   (LPIPS v0.1 linear heads, lpips pip package)
    #     https://github.com/richzhang/PerceptualSimilarity/raw/master/
    #       lpips/weights/v0.1/vgg.pth
    #   dino_vits8.bin  (HF facebook/dino-vits8 ViTModel weights)
    #     https://huggingface.co/facebook/dino-vits8/resolve/main/
    #       pytorch_model.bin
    #   pt_inception-2015-12-05-6726825d.pth  (pytorch-fid's InceptionV3)
    #     https://github.com/mseitzer/pytorch-fid/releases/download/
    #       fid_weights/pt_inception-2015-12-05-6726825d.pth
    #   rgb_imagenet.pt  (pytorch-i3d InceptionI3d, 400 classes)
    #     https://github.com/piergiaj/pytorch-i3d/raw/master/models/
    #       rgb_imagenet.pt

    # drop them into one directory, then:
    python scripts/fetch_weights.py --src_dir /path/to/drop \
        --out_dir weights [--verify]

Conversion emits the npz files the runtime loaders consume and prints the
export lines for the four env vars. `--verify` runs the real-weight parity
tests (tests/test_real_weights.py) against the converted files: each test
loads the REAL state dict into the repo's torch replica of the upstream
network and asserts our JAX graph matches its forward.
"""

import argparse
import hashlib
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# (drop filenames we recognize, env var, npz name, convert fn name)
ARTIFACTS = {
    "lpips": dict(
        files=("vgg16-397923af.pth", "vgg.pth"),
        env="SLOTDIFFUSION_LPIPS_WEIGHTS",
        npz="lpips_vgg16.npz",
    ),
    "dino": dict(
        files=("dino_vits8.bin",),
        alt_files=("pytorch_model.bin",),
        env="SLOTDIFFUSION_DINO_WEIGHTS",
        npz="dino_vits8.npz",
    ),
    "inception": dict(
        files=("pt_inception-2015-12-05-6726825d.pth",),
        env="SLOTDIFFUSION_INCEPTION_WEIGHTS",
        npz="inception_fid.npz",
    ),
    "i3d": dict(
        files=("rgb_imagenet.pt",),
        env="SLOTDIFFUSION_I3D_WEIGHTS",
        npz="i3d_fvd.npz",
    ),
}


def _sha256(path, limit=None):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def _find(src_dir, names):
    for n in names:
        p = os.path.join(src_dir, n)
        if os.path.isfile(p):
            return p
    return None


def convert_all(src_dir, out_dir):
    """Convert every recognized dropped file; return {name: npz_path}."""
    os.makedirs(out_dir, exist_ok=True)
    done = {}

    vgg = _find(src_dir, ("vgg16-397923af.pth",))
    lin = _find(src_dir, ("vgg.pth",))
    if vgg and lin:
        from slotdiffusion_tpu.ops.lpips import convert_torch_lpips_npz
        out = os.path.join(out_dir, ARTIFACTS["lpips"]["npz"])
        convert_torch_lpips_npz(vgg, lin, out)
        done["lpips"] = out
        print(f"[lpips] {os.path.basename(vgg)} sha256={_sha256(vgg)}")
        print(f"[lpips] {os.path.basename(lin)} sha256={_sha256(lin)}")

    dino = _find(src_dir, ARTIFACTS["dino"]["files"] +
                 ARTIFACTS["dino"]["alt_files"])
    if dino:
        import torch

        from slotdiffusion_tpu.models.dino import convert_hf_dino_npz
        sd = torch.load(dino, map_location="cpu")
        out = os.path.join(out_dir, ARTIFACTS["dino"]["npz"])
        # dino-vits8: 6 heads x 12 layers (dino.py small_size)
        convert_hf_dino_npz(sd, out, num_heads=6, depth=12)
        done["dino"] = out
        print(f"[dino] {os.path.basename(dino)} sha256={_sha256(dino)}")

    inc = _find(src_dir, ARTIFACTS["inception"]["files"])
    if inc:
        from slotdiffusion_tpu.ops.fid import convert_torch_inception_npz
        out = os.path.join(out_dir, ARTIFACTS["inception"]["npz"])
        convert_torch_inception_npz(inc, out)
        done["inception"] = out
        print(f"[inception] {os.path.basename(inc)} sha256={_sha256(inc)}")

    i3d = _find(src_dir, ARTIFACTS["i3d"]["files"])
    if i3d:
        from slotdiffusion_tpu.ops.fvd import convert_torch_i3d_npz
        out = os.path.join(out_dir, ARTIFACTS["i3d"]["npz"])
        convert_torch_i3d_npz(i3d, out)
        done["i3d"] = out
        print(f"[i3d] {os.path.basename(i3d)} sha256={_sha256(i3d)}")

    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_dir", required=True,
                    help="directory holding the dropped .pth/.pt/.bin files")
    ap.add_argument("--out_dir", default="weights",
                    help="where the converted .npz files go")
    ap.add_argument("--verify", action="store_true",
                    help="run the real-weight parity tests against the "
                         "converted files")
    args = ap.parse_args()

    done = convert_all(args.src_dir, args.out_dir)
    missing = sorted(set(ARTIFACTS) - set(done))
    if not done:
        print(f"no recognized weight files in {args.src_dir!r}; expected "
              "any of:")
        for name, spec in ARTIFACTS.items():
            print(f"  {name}: {', '.join(spec['files'])}")
        sys.exit(1)
    print("\nconverted. export these before training/eval:")
    for name, path in done.items():
        print(f"  export {ARTIFACTS[name]['env']}={os.path.abspath(path)}")
    if missing:
        print(f"not dropped (skipped): {', '.join(missing)}")

    if args.verify:
        env = dict(os.environ)
        env["SLOTDIFFUSION_WEIGHTS_DROP"] = os.path.abspath(args.src_dir)
        for name, path in done.items():
            env[ARTIFACTS[name]["env"]] = os.path.abspath(path)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/test_real_weights.py",
             "-v"], cwd=_REPO, env=env)
        sys.exit(rc)


if __name__ == "__main__":
    main()
