"""CLIP contrastive model parity vs transformers.CLIPModel (tiny, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.clip import Clip, ClipConfig, ClipTextConfig, clip_params_from_hf
from sprc_tpu.models.vit import ViTConfig

IMG = 32
PATCH = 16
VW = 32
VDEPTH = 2
TW = 32
TDEPTH = 2
HEADS = 2
VOCAB = 70
CTX = 12
EMBED = 24
B = 2


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    try:
        from transformers import CLIPConfig as HFConfig
        from transformers import CLIPModel as HFModel
        from transformers import CLIPTextConfig as HFText
        from transformers import CLIPVisionConfig as HFVision
    except Exception:
        pytest.skip("transformers CLIP unavailable")

    hf_cfg = HFConfig.from_text_vision_configs(
        HFText(
            vocab_size=VOCAB, hidden_size=TW, intermediate_size=TW * 4,
            num_hidden_layers=TDEPTH, num_attention_heads=HEADS,
            max_position_embeddings=CTX, hidden_act="quick_gelu",
            attention_dropout=0.0, eos_token_id=VOCAB - 1,
        ),
        HFVision(
            hidden_size=VW, intermediate_size=VW * 4, num_hidden_layers=VDEPTH,
            num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
            hidden_act="quick_gelu", attention_dropout=0.0,
        ),
        projection_dim=EMBED,
    )
    torch.manual_seed(8)
    hf = HFModel(hf_cfg).eval()

    cfg = ClipConfig(
        embed_dim=EMBED,
        image_size=IMG,
        vision=ViTConfig(
            image_size=IMG, patch_size=PATCH, width=VW, depth=VDEPTH,
            num_heads=HEADS, mlp_hidden=VW * 4, layer_norm_eps=1e-5,
            use_ln_pre=True, quick_gelu=True, final_norm=True, patch_bias=False,
            dtype=jnp.float32,
        ),
        text=ClipTextConfig(
            vocab_size=VOCAB, width=TW, layers=TDEPTH, heads=HEADS,
            context_length=CTX,
        ),
    )
    model = Clip(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = clip_params_from_hf(sd, vision_depth=VDEPTH, text_depth=TDEPTH)
    return hf, model, params


def test_clip_logits_parity(pair, rng):
    import torch

    hf, model, params = pair
    images = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    # CLIP eot pooling: HF pools at input_ids.argmax(-1) (eot = largest id)
    ids = rng.randint(1, VOCAB - 1, (B, CTX)).astype(np.int32)
    ids[:, -1] = VOCAB - 1  # eot
    eot = ids.argmax(-1)

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids).long(),
            pixel_values=torch.from_numpy(images),
        )
        want_logits = out.logits_per_image.numpy()
        want_img = out.image_embeds.numpy()
        want_txt = out.text_embeds.numpy()

    logits, img, txt = model.apply(
        {"params": params},
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(ids),
        jnp.asarray(eot),
    )
    np.testing.assert_allclose(np.asarray(img), want_img, atol=3e-5)
    np.testing.assert_allclose(np.asarray(txt), want_txt, atol=3e-5)
    np.testing.assert_allclose(np.asarray(logits), want_logits, atol=2e-4)


def test_clip_registry():
    from sprc_tpu.registry import registry

    assert registry.get_model_class("clip") is Clip
    assert registry.get_model_class("clip_feature_extractor") is Clip
