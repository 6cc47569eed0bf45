"""Instruct/LLM-head CLI: retrieval or generation with the LLM-backed
models (blip2_vicuna_instruct, blip2_instruct_cir, blip2_t5, blip2_opt).

The reference exposes these via ``load_model_and_preprocess``
(src/lavis/models/__init__.py:204-249); here the flow is explicit:

  # synthetic smoke run (tiny dims, random weights, whitespace tokenizers)
  python -m sprc_tpu.cli.instruct --model-name blip2_vicuna_instruct --synthetic

  # real weights: a torch/orbax checkpoint + local tokenizer.json files
  python -m sprc_tpu.cli.instruct --model-name blip2_t5 \
      --model-path ckpt.pt --vocab-path vocab.txt \
      --llm-tokenizer /path/vicuna/tokenizer.json --images dir/ --prompt "..."

Prints one JSON line with the run summary.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

RETRIEVAL_MODELS = ("blip2_vicuna_instruct",)
GENERATE_MODELS = ("blip2_instruct_cir", "blip2_t5", "blip2_opt")


def build_synthetic(name: str):
    """Tiny-config model + random params + whitespace tokenizers."""
    import jax
    import jax.numpy as jnp

    import sprc_tpu  # noqa: F401
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.registry import registry
    from sprc_tpu.text.llm_tokenizers import WhitespaceTokenizer

    IMG, VOCAB, TXT, Q = 28, 60, 6, 4
    vcfg = ViTConfig(image_size=IMG, patch_size=14, width=32, depth=2,
                     num_heads=2, mlp_hidden=64, qkv_fused_no_kbias=True,
                     dtype=jnp.float32)
    qcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                         num_heads=2, intermediate_size=64, encoder_width=32,
                         query_length=Q, dropout_rate=0.0)
    cfg = CirConfig(vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
                    max_txt_len=TXT, vocab_size=VOCAB, vit_dtype=jnp.float32,
                    embed_dim=16, vit_config_override=vcfg,
                    qformer_config_override=qcfg)
    cls = registry.get_model_class(name)
    if name in ("blip2_vicuna_instruct", "blip2_instruct_cir"):
        from sprc_tpu.models.llama import LlamaConfig

        model = cls(cfg, LlamaConfig(vocab_size=80, hidden_size=48,
                                     intermediate_size=96, num_layers=2,
                                     num_heads=4))
        llm_vocab = 80
    elif name == "blip2_t5":
        from sprc_tpu.models.t5 import T5Config

        model = cls(cfg, T5Config(vocab_size=80, d_model=32, d_kv=8, d_ff=64,
                                  num_heads=4, num_layers=2,
                                  num_decoder_layers=2))
        llm_vocab = 80
    else:  # blip2_opt
        from sprc_tpu.models.opt import OPTConfig

        model = cls(cfg, OPTConfig(vocab_size=80, hidden_size=48,
                                   ffn_dim=96, num_layers=2, num_heads=4))
        llm_vocab = 80

    bert_tok = WhitespaceTokenizer(vocab_size=VOCAB - 4, pad_id=0, eos_id=1,
                                   bos_id=2)
    llm_tok = WhitespaceTokenizer(vocab_size=llm_vocab - 4, pad_id=0,
                                  eos_id=1, bos_id=2)
    return model, bert_tok, llm_tok, IMG, TXT


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-name", required=True,
                   choices=RETRIEVAL_MODELS + GENERATE_MODELS)
    p.add_argument("--synthetic", action="store_true",
                   help="tiny random model + synthetic data (smoke run)")
    p.add_argument("--model-path", default=None)
    p.add_argument("--vocab-path", default=None)
    p.add_argument("--llm-tokenizer", default=None,
                   help="local tokenizer.json for the LLM side")
    p.add_argument("--prompt", default="a photo of")
    p.add_argument("--n-gallery", type=int, default=8)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--max-new-tokens", type=int, default=8)
    args = p.parse_args()

    import jax

    if args.synthetic:
        # tiny random model: run on CPU, never through the TPU tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if args.synthetic:
        model, bert_tok, llm_tok, img, txt = build_synthetic(args.model_name)
        from sprc_tpu.loader import init_params

        params = init_params_for(model, img, txt)
    else:
        raise SystemExit(
            "non-synthetic mode needs real weights + tokenizer exports; "
            "pass --synthetic for the smoke run (weights are not shipped in "
            "this environment)"
        )

    rs = np.random.RandomState(0)
    out: dict = {"model": args.model_name, "mode": "synthetic"}

    if args.model_name in RETRIEVAL_MODELS:
        gallery = jnp.asarray(rs.rand(args.n_gallery, img, img, 3), jnp.float32)
        feats, _ = model.apply(
            {"params": params}, gallery, method=model.extract_target_features
        )
        caps = ["make it red", "longer sleeves"][: args.batch]
        bt = bert_tok(caps, max_length=txt)
        lt = llm_tok(caps, max_length=txt)
        refs = jnp.asarray(rs.rand(args.batch, img, img, 3), jnp.float32)
        ref_embeds = model.apply({"params": params}, refs, method=model.encode_image)
        sims = model.apply(
            {"params": params}, ref_embeds, feats,
            jnp.asarray(bt["input_ids"]), jnp.asarray(bt["attention_mask"]),
            jnp.asarray(lt["input_ids"]), jnp.asarray(lt["attention_mask"]),
            method=model.inference,
        )
        sims = np.asarray(sims)
        out.update(
            task="retrieval", sims_shape=list(sims.shape),
            finite=bool(np.isfinite(sims).all()),
            top1=np.argmax(sims, axis=1).tolist(),
        )
    else:
        images = jnp.asarray(rs.rand(args.batch, img, img, 3), jnp.float32)
        prompts = [args.prompt] * args.batch
        bt = bert_tok(prompts, max_length=txt)
        lt = llm_tok(prompts, max_length=txt)
        if args.model_name == "blip2_instruct_cir":
            from sprc_tpu.models.instruct_cir import instruct_generate

            ids = instruct_generate(
                model, params, images,
                jnp.asarray(bt["input_ids"]), jnp.asarray(bt["attention_mask"]),
                jnp.asarray(lt["input_ids"]), jnp.asarray(lt["attention_mask"]),
                eos_token_id=llm_tok.eos_id, pad_token_id=llm_tok.pad_id,
                max_new_tokens=args.max_new_tokens,
            )
        else:  # blip2_t5 / blip2_opt
            ids = model.generate_ids(
                params, images,
                jnp.asarray(lt["input_ids"]), jnp.asarray(lt["attention_mask"]),
                eos_token_id=llm_tok.eos_id, pad_token_id=llm_tok.pad_id,
                max_new_tokens=args.max_new_tokens,
            )
        texts = [llm_tok.decode(row) for row in np.asarray(ids)]
        out.update(task="generate", n_outputs=len(texts), outputs=texts)

    print(json.dumps(out))


def init_params_for(model, img: int, txt: int):
    """Init tiny params for any of the four model signatures."""
    import jax
    import jax.numpy as jnp

    B = 1
    imgs = jnp.zeros((B, img, img, 3), jnp.float32)
    ids = jnp.zeros((B, txt), jnp.int32)
    mask = jnp.ones((B, txt), jnp.int32)
    name = type(model).__name__
    if name == "VicunaInstructCir":
        return model.init(
            jax.random.PRNGKey(0), imgs, imgs, ids, mask, ids, mask
        )["params"]
    if name == "InstructCir":
        return model.init(
            jax.random.PRNGKey(0), imgs, ids, mask, ids, mask, mask
        )["params"]
    if name == "Blip2T5":
        return model.init(
            jax.random.PRNGKey(0), imgs, ids, mask, ids, mask
        )["params"]
    return model.init(jax.random.PRNGKey(0), imgs, ids, mask)["params"]


if __name__ == "__main__":
    main()
