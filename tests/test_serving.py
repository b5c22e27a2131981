"""AOT serving exports (slotdiffusion_tpu/serving.py): jax.export
round-trips for the encode / sample / denoise surfaces.

The exported artifact must reproduce the live model's outputs exactly
(same program, same backend) and reload via nothing but the file.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu import serving
from slotdiffusion_tpu.models import build_model

from test_models_forward import (RES, SLOT_SIZE, _init_and_loss, _p,
                                 enc_dict, img_batch, slot_dict,
                                 tiny_unet_dict, tiny_vae_dict, video_batch)

# fast tier: the encode/denoise/http/artifact tests; the two
# full sampling-chain exports stay in the slow (nightly) tier
# to keep `pytest -m fast` inside its wall-clock budget


def _tiny_sa_ldm():
    params = _p(model="SADiffusion", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(
                    resolution=tuple(r // 2 for r in RES),
                    unet_dict=tiny_unet_dict(),
                    vae_dict=tiny_vae_dict(),
                    use_ema=False,
                    diffusion_dict=dict(
                        pred_target="eps", timesteps=50,
                        beta_schedule="linear", linear_start=1e-4,
                        linear_end=2e-2, log_every_t=25),
                    conditioning_key="crossattn", cond_stage_key="slots"),
                loss_dict=dict(use_denoise_loss=True))
    model = build_model(params)
    batch = img_batch()
    variables, _, _ = _init_and_loss(model, batch)
    return model, {"params": variables["params"]}, batch


@pytest.mark.fast
def test_export_encode_roundtrip(tmp_path):
    model, variables, batch = _tiny_sa_ldm()
    fn, example = serving.build_serving_fn(
        model, variables, "encode", (2, *RES, 3))
    path = str(tmp_path / "encode.shlo")
    header = serving.save_artifact(path, fn, example,
                                   meta={"what": "encode"})
    assert header["args"][0]["shape"] == [2, *RES]+[3]

    call, header2 = serving.load_artifact(path)
    assert header2["meta"]["what"] == "encode"
    img = np.asarray(batch["img"])
    slots_live, masks_live = fn(jnp.asarray(img))
    slots_exp, masks_exp = call(img)
    np.testing.assert_allclose(np.asarray(slots_exp),
                               np.asarray(slots_live), rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(masks_exp),
                               np.asarray(masks_live), rtol=2e-5,
                               atol=2e-6)


@pytest.mark.fast
def test_export_denoise_roundtrip(tmp_path):
    model, variables, _ = _tiny_sa_ldm()
    fn, example = serving.build_serving_fn(
        model, variables, "denoise", (2, *RES, 3))
    x, t, slots = example
    assert x.shape == (2, 16, 16, 3)  # latent res = RES // 2
    path = str(tmp_path / "denoise.shlo")
    serving.save_artifact(path, fn, example, meta={"what": "denoise"})
    call, _ = serving.load_artifact(path)

    r = np.random.RandomState(0)
    x = r.randn(*x.shape).astype(np.float32)
    t = np.full(t.shape, 25, np.int32)
    slots = r.randn(*slots.shape).astype(np.float32)
    live = fn(jnp.asarray(x), jnp.asarray(t), jnp.asarray(slots))
    exp = call(x, t, slots)
    np.testing.assert_allclose(np.asarray(exp), np.asarray(live),
                               rtol=2e-5, atol=2e-6)


def test_export_sample_deterministic(tmp_path):
    model, variables, batch = _tiny_sa_ldm()
    fn, example = serving.build_serving_fn(
        model, variables, "sample", (2, *RES, 3))
    seed, slots = example
    assert slots.shape == (2, 4, SLOT_SIZE)
    path = str(tmp_path / "sample.shlo")
    serving.save_artifact(path, fn, example, meta={"what": "sample"})
    call, _ = serving.load_artifact(path)

    r = np.random.RandomState(1)
    slots = r.randn(*slots.shape).astype(np.float32)
    live = np.asarray(fn(jnp.int32(7), jnp.asarray(slots)))
    exp = np.asarray(call(np.int32(7), slots))
    assert live.shape == (2, *RES, 3)  # VQ-decoded back to pixels
    # the deserialized program compiles through a separate XLA pipeline
    # than the live jit (different fusion choices); over a 20-step solver
    # chain that accumulates to ~1e-4 relative — same trajectory, not
    # bitwise
    np.testing.assert_allclose(exp, live, rtol=1e-3, atol=1e-4)
    # seed actually steers the chain
    other = np.asarray(call(np.int32(8), slots))
    assert np.abs(other - exp).max() > 1e-4


def test_export_video_sample_folds_time(tmp_path):
    params = _p(model="SAViDiffusion", resolution=RES,
                slot_dict=slot_dict(), enc_dict=enc_dict(),
                pred_dict=dict(pred_type="transformer", pred_rnn=False,
                               pred_norm_first=True, pred_num_layers=1,
                               pred_num_heads=2,
                               pred_ffn_dim=SLOT_SIZE * 2),
                dec_dict=dict(
                    resolution=RES,
                    unet_dict=tiny_unet_dict(),
                    use_ema=False,
                    diffusion_dict=dict(
                        pred_target="eps", timesteps=50,
                        beta_schedule="linear", linear_start=1e-4,
                        linear_end=2e-2, log_every_t=25),
                    conditioning_key="crossattn", cond_stage_key="slots"),
                loss_dict=dict(use_denoise_loss=True))
    model = build_model(params)
    batch = video_batch(B=1, T=2)
    variables, _, _ = _init_and_loss(model, batch)
    variables = {"params": variables["params"]}

    fn, example = serving.build_serving_fn(
        model, variables, "sample", (1, 2, *RES, 3))
    seed, slots = example
    assert slots.shape == (1, 2, 4, SLOT_SIZE)  # [B, T, N, C]
    out = fn(jnp.int32(0), jnp.asarray(
        np.random.RandomState(2).randn(*slots.shape).astype(np.float32)))
    assert out.shape == (1, 2, *RES, 3)  # unfolded back to [B, T, ...]


@pytest.mark.fast
def test_export_cross_platform(tmp_path):
    """Cross-lowering: a CPU host exports for tpu+cpu; the artifact
    records its platforms and still executes on the CPU backend."""
    model, variables, _ = _tiny_sa_ldm()
    fn, example = serving.build_serving_fn(
        model, variables, "encode", (2, *RES, 3))
    path = str(tmp_path / "multi.shlo")
    header = serving.save_artifact(path, fn, example,
                                   platforms=("tpu", "cpu"))
    assert header["platforms"] == ["tpu", "cpu"]
    call, _ = serving.load_artifact(path)
    img = np.zeros((2, *RES, 3), np.float32)
    slots, masks = call(img)
    live_slots, _ = fn(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(slots), np.asarray(live_slots),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.fast
def test_http_server_roundtrip(tmp_path):
    """scripts/serve_model.py: /health + /predict over a live local
    server against an exported encode artifact."""
    import io
    import json
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, "scripts")
    from serve_model import make_server

    model, variables, batch = _tiny_sa_ldm()
    fn, example = serving.build_serving_fn(
        model, variables, "encode", (2, *RES, 3))
    path = str(tmp_path / "encode.shlo")
    serving.save_artifact(path, fn, example, meta={"what": "encode"})

    srv = make_server(path, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        health = json.loads(
            urllib.request.urlopen(f"{base}/health", timeout=30).read())
        assert health["status"] == "ok"
        assert health["meta"]["what"] == "encode"

        img = np.asarray(batch["img"], np.float32)
        buf = io.BytesIO()
        np.savez(buf, arg0=img)
        req = urllib.request.Request(f"{base}/predict", buf.getvalue(),
                                     method="POST")
        out = np.load(io.BytesIO(
            urllib.request.urlopen(req, timeout=60).read()))
        live_slots, live_masks = fn(jnp.asarray(img))
        np.testing.assert_allclose(out["out0"], np.asarray(live_slots),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(out["out1"], np.asarray(live_masks),
                                   rtol=2e-5, atol=2e-6)

        # shape mismatch -> 400 with a useful message
        bad = io.BytesIO()
        np.savez(bad, arg0=img[:1])
        req = urllib.request.Request(f"{base}/predict", bad.getvalue(),
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert b"arg0" in e.read()
    finally:
        srv.shutdown()


@pytest.mark.fast
def test_load_rejects_non_artifact(tmp_path):
    p = tmp_path / "junk.shlo"
    p.write_bytes(b'{"magic": "nope"}\nxx')
    with pytest.raises(ValueError):
        serving.load_artifact(str(p))
