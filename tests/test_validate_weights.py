"""--validate_weights readiness drill + retrieve.py offline coverage
(VERDICT r4 next #8).

The drill loads a *torch-mirror* synthetic weights dir (diffusers layout,
tests/torch_sd_mirror.py) through the exact production path
(guidance/weights.py::load_sd_weights) and asserts the report shows the
weights actually landed (checksums move) and the ε-prediction / VAE encode /
CLIP match all ran finite.  retrieve.py's two offline-reachable halves —
the LAION manifest writer (with a faked clip_retrieval client) and the
local-SD fallback — are covered for their manifest/image contract
(reference custom_diffusion/retrieve.py:25-74)."""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)


@pytest.fixture(scope="module")
def tiny_sd():
    """Tiny guidance stack whose UNet/VAE configs exactly match the torch
    mirror below (ctx 768 so the production TextEncoder drives the UNet)."""
    import jax
    import jax.numpy as jnp
    from customnerf_tpu.config import Config
    from customnerf_tpu.guidance.scheduler import DDPMSchedule
    from customnerf_tpu.guidance.sds import StableDiffusionGuidance
    from customnerf_tpu.guidance.text import TextEncoder
    from customnerf_tpu.guidance.unet import UNet2DCondition, UNetConfig
    from customnerf_tpu.guidance.vae import AutoencoderKL, VAEConfig

    opt = Config(data_type="synthetic", seed=0, text="a corgi")
    g = StableDiffusionGuidance.__new__(StableDiffusionGuidance)
    g.opt = opt
    g.unet = UNet2DCondition(UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=768, attention_head_dim=4, norm_num_groups=8))
    g.vae = AutoencoderKL(VAEConfig(
        block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8))
    key = jax.random.PRNGKey(0)
    g.unet_params = g.unet.init(key, jnp.zeros((1, 8, 8, 4)),
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 77, 768)))
    g.vae_params = g.vae.init({"params": key}, jnp.zeros((1, 64, 64, 3)), key)
    g.cd_kv = None
    g.scheduler = DDPMSchedule()
    g.num_train_timesteps = 1000
    g.min_step, g.max_step = 20, 980
    g.alphas = g.scheduler.alphas_cumprod
    g.text_encoder = TextEncoder("1.5", weights_dir=None, seed=0)
    g.system = None
    return g, opt


def _make_weights_dir(tmp_path):
    """diffusers-layout dir from the torch mirror (UNet + VAE + a small
    torch CLIPTextModel for text_encoder/)."""
    import torch
    from torch_sd_mirror import TorchUNet, TorchVAE

    wdir = tmp_path / "sd_weights"
    (wdir / "unet").mkdir(parents=True)
    (wdir / "vae").mkdir()

    torch.manual_seed(3)
    tunet = TorchUNet(block_out_channels=(32, 64), layers_per_block=1,
                      cross_attention_dim=768, attention_head_dim=4,
                      norm_num_groups=8, use_linear_projection=False)
    torch.save(tunet.state_dict(),
               wdir / "unet" / "diffusion_pytorch_model.bin")
    tvae = TorchVAE(block_out_channels=(16, 32), layers_per_block=1,
                    groups=8)
    torch.save(tvae.state_dict(),
               wdir / "vae" / "diffusion_pytorch_model.bin")

    from transformers import CLIPTextConfig, CLIPTextModel
    te = CLIPTextModel(CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77))
    te.save_pretrained(str(wdir / "text_encoder"), safe_serialization=False)
    return str(wdir)


def test_validate_weights_drill(tiny_sd, tmp_path, monkeypatch):
    import customnerf_tpu.guidance.clip_view as cv
    from customnerf_tpu.guidance.validate import _tree_stats, validate_weights

    g, opt = tiny_sd
    wdir = _make_weights_dir(tmp_path)

    # tiny CLIP so the view-match leg runs in test time
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    def tiny_cfg():
        return CLIPConfig.from_text_vision_configs(
            CLIPTextConfig(vocab_size=49408, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2,
                           max_position_embeddings=77),
            CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             image_size=224, patch_size=56),
            projection_dim=16)

    monkeypatch.setattr(cv, "_vit_b32_config", tiny_cfg)

    before = {"unet": _tree_stats(g.unet_params)["checksum"],
              "vae": _tree_stats(g.vae_params)["checksum"],
              "text": _tree_stats(g.text_encoder.params)["checksum"]}

    opt.sd_weights = wdir
    opt.clip_view = True
    report = validate_weights(opt, guidance=g)

    assert report["ok"]
    assert report["weights_loaded"]
    # the weights actually landed: every submodel checksum moved
    assert abs(report["unet"]["checksum"] - before["unet"]) > 1e-3
    assert abs(report["vae"]["checksum"] - before["vae"]) > 1e-3
    assert abs(report["text_encoder"]["checksum"] - before["text"]) > 1e-3
    # ε-prediction / VAE encode / CLIP match all ran and are finite
    assert report["eps_prediction"]["finite"]
    assert report["eps_prediction"]["shape"] == [2, 8, 8, 4]
    assert report["vae_encode"]["finite"]
    probs = report["clip_match"]["probs"]
    assert len(probs) == 3 and abs(sum(probs) - 1.0) < 1e-3


def test_validate_weights_cli_flag():
    from customnerf_tpu.config import parse_args

    opt = parse_args(["--validate_weights", "--data_type", "synthetic",
                      "--sd_version", "1.5"])
    assert opt.validate_weights


# ----------------------------------------------------------------- retrieve
def test_retrieve_laion_manifests(tmp_path, monkeypatch):
    """The LAION path's download/manifest contract, exercised offline via a
    faked clip_retrieval client (the package + egress are unavailable here —
    VERDICT r4 P13)."""
    from customnerf_tpu.guidance import retrieve as rt

    # fake clip_retrieval.clip_client.ClipClient
    fake_pkg = types.ModuleType("clip_retrieval")
    fake_mod = types.ModuleType("clip_retrieval.clip_client")

    class FakeClient:
        def __init__(self, **kw):
            self.kw = kw

        def query(self, text):
            return [{"url": f"http://x/{i}.jpg", "caption": f"{text} {i}"}
                    for i in range(6)]

    fake_mod.ClipClient = FakeClient
    fake_pkg.clip_client = fake_mod
    monkeypatch.setitem(sys.modules, "clip_retrieval", fake_pkg)
    monkeypatch.setitem(sys.modules, "clip_retrieval.clip_client", fake_mod)

    fetched = []

    def fake_urlretrieve(url, name):
        fetched.append(url)
        if url.endswith("2.jpg"):          # one dead link → skipped
            raise OSError("404")
        with open(name, "wb") as f:
            f.write(b"\xff\xd8jpegish")

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)

    out = str(tmp_path / "class_images")
    n = rt.retrieve("corgi", out, 3)
    assert n == 3
    caps = open(os.path.join(out, "caption.txt")).read().splitlines()
    urls = open(os.path.join(out, "urls.txt")).read().splitlines()
    names = open(os.path.join(out, "images.txt")).read().splitlines()
    assert len(caps) == len(urls) == len(names) == 3
    assert "http://x/2.jpg" not in urls           # failed download skipped
    assert all(os.path.exists(p) for p in names)
    assert caps[0] == "corgi 0"

    # already-populated dir short-circuits (reference retrieve.py:25-27)
    assert rt.retrieve("corgi", out, 3) == 3


def test_retrieve_sd_fallback_manifests(tiny_sd, tmp_path, monkeypatch):
    """No clip_retrieval + a guidance model → class images are *generated*
    and the caption/images manifests are written."""
    import customnerf_tpu.guidance.sampler as sampler
    from customnerf_tpu.guidance import retrieve as rt

    g, _ = tiny_sd
    rng = np.random.RandomState(0)
    monkeypatch.setattr(
        sampler, "ddim_sample",
        lambda guidance, prompt, key, num_steps=50, **kw:
        rng.rand(32, 32, 3).astype(np.float32))

    out = str(tmp_path / "gen_images")
    n = rt.retrieve("ball", out, 2, guidance=g)
    assert n == 2
    names = open(os.path.join(out, "images.txt")).read().splitlines()
    caps = open(os.path.join(out, "caption.txt")).read().splitlines()
    assert len(names) == 2 and all(os.path.exists(p) for p in names)
    assert caps == ["ball", "ball"]

    # no retrieval AND no guidance → loud failure, not silent emptiness
    with pytest.raises(RuntimeError):
        rt.retrieve("ball", str(tmp_path / "empty"), 2, guidance=None)
