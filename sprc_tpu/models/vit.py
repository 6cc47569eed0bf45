"""Frozen vision towers: EVA ViT-g and CLIP ViT-L, TPU-native.

Re-implementations (not ports) of the two BLIP-2 image encoders:

- EVA ViT-g (reference: src/lavis/models/eva_vit.py:428-455): patch 14,
  width 1408, depth 39, heads 16 (1408/88), mlp_ratio 4.3637, fused qkv with
  *separate q/v bias and zero k bias* (eva_vit.py:118-126), pre-LN blocks,
  LN eps 1e-6, NO final LayerNorm — the raw 257-token sequence feeds
  ``ln_vision`` downstream.
- CLIP ViT-L (reference: src/lavis/models/clip_vit.py:242-263): patch 14,
  width 1024, 23 layers (the 24th dropped, BLIP-2 style), heads 16,
  QuickGELU, ln_pre, packed qkv *with* bias + out-proj, NO final LayerNorm.

TPU-first choices: NHWC image layout (the conv patchifier lowers to a single
MXU matmul), bfloat16 compute with float32 LayerNorms (replacing the
reference's fp16 + fp32-LN bridge), and Pallas flash attention for the
257-token sequences via :func:`sprc_tpu.ops.attention.dot_product_attention`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.ops.attention import dot_product_attention
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32, quick_gelu

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_hidden: int = 6144
    layer_norm_eps: float = 1e-6
    use_ln_pre: bool = False  # CLIP-style pre-transformer LN
    qkv_fused_no_kbias: bool = False  # EVA-style q/v bias, zero k bias
    quick_gelu: bool = False
    final_norm: bool = False  # BLIP-1 ViT applies a final LayerNorm
    patch_bias: bool = True  # CLIP's conv1 has no bias
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # activation checkpointing per block
    # compile the block ONCE and lax.scan it over stacked per-layer params
    # instead of unrolling depth copies — shrinks the XLA module (and its
    # compile time) by ~depth; numerically identical
    scan_blocks: bool = False
    # int8 MXU path for the big matmuls (qkv/proj/fc1/fc2); param tree is
    # UNCHANGED (fp32 masters quantized on the fly), so checkpoints/interop
    # are unaffected. Serving-only (the tower is frozen); A/B in
    # tests/test_quant.py.
    #   "int8"        - dynamic per-token activation scales (accurate but the
    #                   amax pass costs a full HBM round trip per matmul)
    #   "int8_static" - calibrated per-tensor scales baked as compile-time
    #                   constants (quantize fuses into the producer; the fast
    #                   path). Scales come from ``act_scales``; calibrate with
    #                   :func:`calibrate_act_scales`.
    #   "int8_calib"  - dynamic path that also sows per-matmul amax values
    #                   (used by calibration)
    quant: Optional[str] = None
    # (("mlp_fc1", s), ("mlp_fc2", s), ("proj", s), ("qkv", s)) — shared across
    # blocks (scan-over-layers compiles one block body, so per-layer scales
    # would need scanned inputs; the max over layers is used instead)
    act_scales: Optional[tuple] = None

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


def eva_vit_g_config(
    image_size: int = 224, dtype=jnp.bfloat16, remat: bool = False,
    scan_blocks: bool = True,
) -> ViTConfig:
    # depth/width/heads/mlp per create_eva_vit_g (eva_vit.py:428-441);
    # mlp hidden = int(1408 * 4.3637) = 6144
    return ViTConfig(
        image_size=image_size,
        patch_size=14,
        width=1408,
        depth=39,
        num_heads=1408 // 88,
        mlp_hidden=int(1408 * 4.3637),
        layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True,
        dtype=dtype,
        remat=remat,
        scan_blocks=scan_blocks,
    )


def clip_vit_l_config(
    image_size: int = 224, dtype=jnp.bfloat16, remat: bool = False,
    scan_blocks: bool = True,
) -> ViTConfig:
    # width/layers/heads per create_clip_vit_L (clip_vit.py:242-250)
    return ViTConfig(
        image_size=image_size,
        patch_size=14,
        width=1024,
        depth=23,
        num_heads=16,
        mlp_hidden=4096,
        layer_norm_eps=1e-5,
        use_ln_pre=True,
        qkv_fused_no_kbias=False,
        quick_gelu=True,
        patch_bias=False,
        dtype=dtype,
        remat=remat,
        scan_blocks=scan_blocks,
    )


def blip_vit_b_config(
    image_size: int = 224, dtype=jnp.bfloat16, remat: bool = False,
    scan_blocks: bool = True,
) -> ViTConfig:
    """BLIP-1 ViT-B/16 (reference vit.py:476-487): standard timm ViT with a
    final LayerNorm; packed qkv with bias, exact GELU, no ln_pre."""
    return ViTConfig(
        image_size=image_size,
        patch_size=16,
        width=768,
        depth=12,
        num_heads=12,
        mlp_hidden=3072,
        layer_norm_eps=1e-6,
        qkv_fused_no_kbias=False,
        final_norm=True,
        dtype=dtype,
        remat=remat,
        scan_blocks=scan_blocks,
    )


class PatchEmbed(nn.Module):
    """Conv patchifier over NHWC images -> [B, N, width]."""

    config: ViTConfig
    use_bias: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(
            features=cfg.width,
            kernel_size=(p, p),
            strides=(p, p),
            use_bias=self.use_bias,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(images.astype(cfg.dtype))
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


def _block_dense(
    cfg: "ViTConfig", mod: nn.Module, x: jnp.ndarray, features: int, name: str,
    use_bias: bool = True,
) -> jnp.ndarray:
    """DenseGeneral, or its int8-MXU twin when ``cfg.quant`` is set.

    All modes create an identical param tree (fp32 kernel/bias under
    ``name``), so quantization is a pure serving-mode switch. ``mod`` is the
    calling module (used to sow calibration stats)."""
    if cfg.quant in ("int8", "int8_calib", "int8_static"):
        from sprc_tpu.ops.layers import DenseParams
        from sprc_tpu.ops.quant import int8_dense_from_fp, int8_dense_static

        w, b = DenseParams(x.shape[-1], features, use_bias=use_bias, name=name)()
        if cfg.quant == "int8_static":
            scales = dict(cfg.act_scales or ())
            if name not in scales:
                raise ValueError(
                    "quant='int8_static' needs calibrated act_scales for "
                    f"'{name}' (have {sorted(scales)}); run "
                    "calibrate_act_scales with quant='int8_calib' first"
                )
            scale = scales[name]
            return int8_dense_static(x, w, float(scale), b, out_dtype=cfg.dtype)
        if cfg.quant == "int8_calib":
            mod.sow(
                "intermediates", f"{name}_amax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum, init_fn=lambda: jnp.asarray(0.0),
            )
        return int8_dense_from_fp(x, w, b, out_dtype=cfg.dtype)
    return DenseGeneral(features, use_bias=use_bias, dtype=cfg.dtype, name=name)(x)


def calibrate_act_scales(model, params, images, **apply_kwargs) -> tuple:
    """Run one calibration batch through the dynamic-int8 tower (build the
    model with ``quant='int8_calib'``) and return
    ``(("mlp_fc1", s), ..., ("qkv", s))`` static scales (amax/127, maxed
    over blocks/batches). Extra kwargs (e.g. ``method=``) forward to
    ``model.apply``."""
    import numpy as np

    _, state = model.apply(
        {"params": params}, images, mutable=["intermediates"], **apply_kwargs
    )
    flat = jax.tree_util.tree_leaves_with_path(state["intermediates"])
    best: dict = {}
    for path, leaf in flat:
        key = "".join(str(p) for p in path)
        for name in ("qkv", "proj", "mlp_fc1", "mlp_fc2"):
            if f"{name}_amax" in key:
                val = float(np.max(np.asarray(leaf)))
                best[name] = max(best.get(name, 0.0), val)
    return tuple(sorted((k, v / 127.0) for k, v in best.items()))


class ViTAttention(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, S, C = x.shape
        H, D = cfg.num_heads, cfg.head_dim

        if cfg.qkv_fused_no_kbias:
            # EVA: one fused qkv matmul without bias, then add q/v bias only
            qkv = _block_dense(cfg, self, x, 3 * C, "qkv", use_bias=False)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,), jnp.float32)
            q = q + q_bias.astype(q.dtype)
            v = v + v_bias.astype(v.dtype)
        else:
            qkv = _block_dense(cfg, self, x, 3 * C, "qkv", use_bias=True)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        # BSHD layout end-to-end: no physical head transpose
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
        ctx = dot_product_attention(q, k, v)
        ctx = ctx.reshape(B, S, C)
        return _block_dense(cfg, self, ctx, C, "proj")


class ViTAttentionParams(nn.Module):
    """Materializes ViTAttention's params without applying the ops — the
    fused-block counterpart (tree-identical to ViTAttention, including EVA's
    split q/v bias, which folds into a packed qkv bias with a zero k third)."""

    config: ViTConfig

    @nn.compact
    def __call__(self):
        from sprc_tpu.ops.layers import DenseParams

        cfg = self.config
        C = cfg.width
        if cfg.qkv_fused_no_kbias:
            wqkv, _ = DenseParams(C, 3 * C, use_bias=False, name="qkv")()
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,), jnp.float32)
            bqkv = jnp.concatenate([q_bias, jnp.zeros((C,), jnp.float32), v_bias])
        else:
            wqkv, bqkv = DenseParams(C, 3 * C, name="qkv")()
        wproj, bproj = DenseParams(C, C, name="proj")()
        return wqkv, bqkv, wproj, bproj


class ViTBlock(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        cfg = self.config
        # SPRC_PALLAS_BLOCK routing (see ops/pallas_block.py, MEASUREMENTS.md):
        #   "0"     - unfused XLA composition
        #   "attn"  - fused attention half-block only (LN1+qkv+attn+proj)
        #   "1"     - whole-block megakernel (both residual branches); with
        #             cfg.quant == "int8_static" the int8 megakernel
        #   "force" - megakernel in interpret mode (CPU tests)
        # Param trees are identical across all routes.
        # default ON for TPU: 20.0 -> 14.07 ms/block bf16, 10.78 int8 at
        # ViT-L b256 (MEASUREMENTS.md). First TPU compile of the megakernel
        # is slow (8-25 min through the remote tunnel, cached afterwards);
        # set SPRC_PALLAS_BLOCK=0 to opt out.
        blk_flag = os.environ.get("SPRC_PALLAS_BLOCK", "1")
        fusable = blk_flag == "force" or (  # interpret mode has no lane rules
            jax.default_backend() == "tpu" and cfg.width % 128 == 0
            # mlp_hidden also lands on the lane dim of [W, mlp_hidden]
            # blocks inside the kernel (mirror the SPRC_PALLAS_MLP gate)
            and cfg.mlp_hidden % 128 == 0
        )
        # measured (MEASUREMENTS.md): G=8 best for both ViT-L paths with
        # batched head attention (int8 10.78 ms/block, bf16 14.07). Wider
        # towers (EVA ViT-g): int8 halves the VMEM-resident weights, so G=8
        # compiles and wins (+2.1%, 418 vs 410 imgs/s b1024, r4 sweep); the
        # bf16 G=8 kernel fails the remote Mosaic compiler (HTTP 500) and
        # G=16/b2048 hang or time out the compile — bf16 stays at the
        # measured-safe G=4. Cold compiles run 8-25 min through the tunnel,
        # cached afterwards.
        if cfg.width <= 1024:
            G_default = "8"
        else:
            G_default = "8" if cfg.quant == "int8_static" else "4"
        G = int(os.environ.get("SPRC_PALLAS_BLOCK_G", G_default))
        if blk_flag in ("1", "force") and fusable and (
            cfg.quant in (None, "int8_static")
        ):
            from sprc_tpu.ops.layers import DenseParams, LayerNormParams
            from sprc_tpu.ops.pallas_block import (
                fused_vit_block,
                fused_vit_block_i8,
            )

            l1s, l1b = LayerNormParams(cfg.width, name="norm1")()
            wqkv, bqkv, wproj, bproj = ViTAttentionParams(cfg, name="attn")()
            l2s, l2b = LayerNormParams(cfg.width, name="norm2")()
            w1, b1 = DenseParams(cfg.width, cfg.mlp_hidden, name="mlp_fc1")()
            w2, b2 = DenseParams(cfg.mlp_hidden, cfg.width, name="mlp_fc2")()
            if bproj is None:
                bproj = jnp.zeros((cfg.width,), jnp.float32)
            if cfg.quant == "int8_static":
                from sprc_tpu.ops.quant import quantize_weight

                sc = dict(cfg.act_scales or ())
                missing = {"qkv", "proj", "mlp_fc1", "mlp_fc2"} - set(sc)
                if missing:
                    raise ValueError(
                        "quant='int8_static' needs calibrated act_scales "
                        f"(missing {sorted(missing)}); run "
                        "calibrate_act_scales with quant='int8_calib' first"
                    )
                wq8, sq = quantize_weight(wqkv)
                wp8, sp = quantize_weight(wproj)
                w18, s1 = quantize_weight(w1)
                w28, s2 = quantize_weight(w2)
                return fused_vit_block_i8(
                    x, l1s, l1b, wq8, sq, bqkv, wp8, sp, bproj, l2s, l2b,
                    w18, s1, b1, w28, s2, b2,
                    heads=cfg.num_heads, eps=cfg.layer_norm_eps,
                    scale=cfg.head_dim ** -0.5, quick=cfg.quick_gelu,
                    acts=(sc["qkv"], sc["proj"], sc["mlp_fc1"], sc["mlp_fc2"]),
                    G=G,
                )
            return fused_vit_block(
                x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b, w1, b1,
                w2, b2, cfg.num_heads, cfg.layer_norm_eps,
                cfg.head_dim ** -0.5, cfg.quick_gelu, G,
            )
        if blk_flag == "attn" and fusable and cfg.quant is None:
            from sprc_tpu.ops.layers import LayerNormParams
            from sprc_tpu.ops.pallas_block import fused_attn_block

            ln_s, ln_b = LayerNormParams(cfg.width, name="norm1")()
            wqkv, bqkv, wproj, bproj = ViTAttentionParams(cfg, name="attn")()
            if bproj is None:
                bproj = jnp.zeros((cfg.width,), jnp.float32)
            x = fused_attn_block(
                x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                cfg.num_heads, cfg.layer_norm_eps, cfg.head_dim ** -0.5, G,
            )
        else:
            h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm1")(x)
            x = x + ViTAttention(cfg, name="attn")(h)

        # default OFF: measured 480 vs 542 imgs/s on v5e — the weight
        # re-streaming per row tile loses to XLA's matmul pipelining at these
        # shapes; kept for larger-batch / multi-slice regimes (opt in with
        # SPRC_PALLAS_MLP=1, or "force" for interpret-mode tests)
        flag = os.environ.get("SPRC_PALLAS_MLP", "0")
        use_fused = (
            flag == "force"
            or (
                flag == "1"
                and jax.default_backend() == "tpu"
                and cfg.width % 128 == 0
                and cfg.mlp_hidden % 128 == 0
            )
        )
        if use_fused:
            # fused LN -> fc1 -> act -> fc2 -> +residual pallas kernel; the
            # *Params modules create trees identical to the unfused modules
            from sprc_tpu.ops.layers import DenseParams, LayerNormParams
            from sprc_tpu.ops.pallas_mlp import fused_mlp_block

            ln_s, ln_b = LayerNormParams(cfg.width, name="norm2")()
            w1, b1 = DenseParams(cfg.width, cfg.mlp_hidden, name="mlp_fc1")()
            w2, b2 = DenseParams(cfg.mlp_hidden, cfg.width, name="mlp_fc2")()
            return fused_mlp_block(
                x,
                ln_s,
                ln_b,
                w1.astype(cfg.dtype),
                b1,
                w2.astype(cfg.dtype),
                b2,
                cfg.layer_norm_eps,
                cfg.quick_gelu,
            )
        act = quick_gelu if cfg.quick_gelu else (lambda h: nn.gelu(h, approximate=False))
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = _block_dense(cfg, self, h, cfg.mlp_hidden, "mlp_fc1")
        h = act(h)
        h = _block_dense(cfg, self, h, cfg.width, "mlp_fc2")
        return x + h


class _ScanViTBlock(nn.Module):
    """ViTBlock with (carry, _) -> (carry, None) signature for nn.scan."""

    config: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, _):
        return ViTBlock(self.config, name="block")(x), None


class _ViTTrunk(nn.Module):
    """Shared cls-token + pos-embed + block stack."""

    config: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = PatchEmbed(cfg, use_bias=cfg.patch_bias, name="patch_embed")(images)
        B = x.shape[0]
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.width), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, cfg.width)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, cfg.seq_len, cfg.width), jnp.float32
        )
        x = x + pos.astype(x.dtype)

        if cfg.use_ln_pre:
            x = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln_pre")(x)

        if cfg.scan_blocks:
            block_cls = _ScanViTBlock
            if cfg.remat:
                block_cls = nn.remat(
                    block_cls, static_argnums=(), prevent_cse=False
                )
            scanned = nn.scan(
                block_cls,
                # intermediates carried with a leading layer axis so
                # calibration sows (quant='int8_calib') survive the scan
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                length=cfg.depth,
                metadata_params={nn.PARTITION_NAME: None},
            )
            x, _ = scanned(cfg, name="blocks")(x, None)
        else:
            block = ViTBlock
            if cfg.remat:
                block = nn.remat(ViTBlock)
            for i in range(cfg.depth):
                x = block(cfg, name=f"block_{i}")(x)
        if cfg.final_norm:  # BLIP-1 ViT (reference vit.py:279); BLIP-2 towers
            x = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm")(x)
        return x  # feed ln_vision downstream (BLIP-2) or projections (BLIP-1)


class EvaViT(nn.Module):
    """EVA ViT-g tower. Returns the full 257-token sequence [B, S, 1408]."""

    config: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return _ViTTrunk(self.config, name="trunk")(images)


class ClipViT(nn.Module):
    """CLIP ViT-L tower (conv has no bias, ln_pre before the blocks)."""

    config: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return _ViTTrunk(self.config, name="trunk")(images)
