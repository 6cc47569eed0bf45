"""Round-3 int8 matmul ceiling interrogation (VERDICT r2 item 1).

Round-2 measured s8xs8->s32 `dot_general` at ~146 TOPS (37% of the v5e
int8 spec peak ~394) while bf16 hits 190 TFLOPs (96% of its 197 peak).
This sweep ablates the lowering to find ANY configuration above 200 TOPS,
or to prove the ~146 wall holds across layouts (stack limitation).

Modes (one per process; the tunnel allows one client at a time):
  shapes   - XLA s8s8s32 dot across (M, K, N) shapes
  variants - 4096^3: rhs-transposed contraction, preferred_element_type
             {s32, s16, f32}, mixed s8 x bf16, bf16 control
  pallas   - tiled Mosaic matmul s8s8->s32, tile shapes via env
             SPRC_I8_BM/BK/BN; bf16 control at the same tiles
  int4     - s4xs4->s32 (guarded: may be unsupported by this stack)

Tunnel rules (MEASUREMENTS.md): scalar readback per step, device-generated
inputs, work amortized inside one jitted chain per config.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _t(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = out if not isinstance(out, tuple) else out[0]
    _ = float(np.asarray(leaf.ravel()[0] if leaf.ndim else leaf))
    return time.perf_counter() - t0


def _rand(shape, dtype, key, lo=-8, hi=8):
    import jax
    import jax.numpy as jnp

    if jnp.issubdtype(dtype, jnp.integer):
        f = jax.jit(lambda k: jax.random.randint(k, shape, lo, hi, dtype))
    else:
        f = jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32) * 0.05).astype(dtype))
    x = f(jax.random.PRNGKey(key))
    _ = float(np.asarray(x.ravel()[0]))
    return x


def _chain_tops(m, k, n, iters, make_dot, lhs_dtype, rhs_dtype, label):
    """Data-dependent chain: y = dot(x, w); x' = requant(y) tiled back to
    [m, k]. Requant cost is O(m*n) vs O(m*n*k) matmul — negligible."""
    import jax
    import jax.numpy as jnp

    w = _rand((k, n), rhs_dtype, 3)
    x = _rand((m, k), lhs_dtype, 4)

    int_lhs = jnp.issubdtype(jnp.dtype(lhs_dtype), jnp.integer)

    @jax.jit
    def chain(x, w):
        def body(i, c):
            y = make_dot(c, w)
            if int_lhs:
                y8 = jax.lax.shift_right_arithmetic(
                    y.astype(jnp.int32), 9).astype(lhs_dtype)
            else:
                y8 = (y * 0.1).astype(lhs_dtype)
            reps = max(1, k // n)
            out = jnp.tile(y8, (1, reps))
            return out[:, :k] if out.shape[1] >= k else jnp.pad(
                out, ((0, 0), (0, k - out.shape[1])))
        return jax.lax.fori_loop(0, iters, body, x)

    try:
        _t(chain, x, w)  # compile + warm
        dt = min(_t(chain, x, w) for _ in range(3))
    except Exception as e:  # noqa: BLE001 - report unsupported configs
        print(json.dumps({"mode": label, "error": str(e)[:200]}))
        return
    tops = 2 * m * n * k * iters / dt / 1e12
    print(json.dumps({"mode": label, "m": m, "k": k, "n": n,
                      "tops": round(tops, 1), "ms": round(dt / iters * 1e3, 3)}))


def mode_shapes():
    import jax
    import jax.numpy as jnp

    dot_s32 = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
    cfgs = [
        (4096, 4096, 4096, 64),
        (2048, 2048, 2048, 256),
        (8192, 8192, 8192, 16),
        (4096, 32768, 4096, 8),   # K-heavy (round-2 mm2 shape)
        (512, 4096, 4096, 256),   # skinny-M (ViT-like row count per tile)
        (4096, 1024, 4096, 128),  # shallow-K
        (256, 1024, 4096, 512),   # ViT-L qkv-ish tile
    ]
    for m, k, n, it in cfgs:
        _chain_tops(m, k, n, it, dot_s32, jnp.int8, jnp.int8,
                    f"s8_{m}x{k}x{n}")


def mode_shapes2():
    """Round B: bf16 controls at the shape extremes + model-sized big-M s8
    (the ViT-L encode does B*S = 131k rows per matmul at batch 512)."""
    import jax
    import jax.numpy as jnp

    dot_s32 = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
    dot_b16 = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.bfloat16)
    cfgs = [
        ("s8", 16384, 16384, 16384, 4),
        ("bf16", 8192, 8192, 8192, 16),
        ("bf16", 256, 1024, 4096, 512),
        ("s8", 65536, 1024, 4096, 16),    # encode-like: huge M, model K/N
        ("bf16", 65536, 1024, 4096, 16),
        ("s8", 65536, 1024, 1024, 32),
        ("s8", 8192, 1024, 4096, 64),
    ]
    for dt, m, k, n, it in cfgs:
        if dt == "s8":
            _chain_tops(m, k, n, it, dot_s32, jnp.int8, jnp.int8,
                        f"s8_{m}x{k}x{n}")
        else:
            _chain_tops(m, k, n, it, dot_b16, jnp.bfloat16, jnp.bfloat16,
                        f"bf16_{m}x{k}x{n}")


def mode_variants():
    import jax
    import jax.numpy as jnp

    m = k = n = 4096
    it = 64

    # control: bf16
    _chain_tops(m, k, n, it,
                lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.bfloat16),
                jnp.bfloat16, jnp.bfloat16, "bf16_ctrl")

    # baseline s8s8->s32
    _chain_tops(m, k, n, it,
                lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32),
                jnp.int8, jnp.int8, "s8_s32")

    # rhs transposed: contract rhs dim 1 (weight stored [n, k])
    def dot_rt(a, b):
        return jax.lax.dot_general(
            a, b.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    _chain_tops(m, k, n, it, dot_rt, jnp.int8, jnp.int8, "s8_rhsT")

    # preferred f32 accumulation (does XLA pick a different MXU mode?)
    _chain_tops(m, k, n, it,
                lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32),
                jnp.int8, jnp.int8, "s8_f32acc")

    # preferred s16 accumulation
    _chain_tops(m, k, n, it,
                lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int16),
                jnp.int8, jnp.int8, "s8_s16acc")

    # mixed: s8 activations x bf16 weights -> f32
    def dot_mixed(a, b):
        return jax.lax.dot(a.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.bfloat16)
    _chain_tops(m, k, n, it, dot_mixed, jnp.int8, jnp.bfloat16, "s8xbf16")


def mode_int4():
    import jax
    import jax.numpy as jnp

    m = k = n = 4096
    for lhs, rhs, label in [
        (jnp.int4, jnp.int4, "s4_s4"),
        (jnp.int8, jnp.int4, "s8_s4"),
    ]:
        try:
            dot = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
            _chain_tops(m, k, n, 64, dot, lhs, rhs, label)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": label, "error": str(e)[:200]}))


def mode_pallas():
    """Tiled Mosaic matmul: does an in-kernel jnp.dot on s8 refs reach a
    different MXU mode than the XLA lowering?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = k = n = 4096
    bm = int(os.environ.get("SPRC_I8_BM", 512))
    bk = int(os.environ.get("SPRC_I8_BK", 2048))
    bn = int(os.environ.get("SPRC_I8_BN", 512))
    it = 32

    def mk_kernel(out_dtype):
        def kernel(a_ref, b_ref, o_ref, acc_ref):
            ki = pl.program_id(2)

            @pl.when(ki == 0)
            def _init():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            acc_ref[...] += jnp.dot(
                a_ref[...], b_ref[...],
                preferred_element_type=acc_ref.dtype)

            @pl.when(ki == k // bk - 1)
            def _done():
                o_ref[...] = acc_ref[...].astype(out_dtype)
        return kernel

    def mk_mm(in_dtype, acc_dtype, out_dtype, label):
        kern = mk_kernel(out_dtype)
        mm = pl.pallas_call(
            kern,
            grid=(m // bm, n // bn, k // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki)),
                pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
            compiler_params=(getattr(pltpu, "CompilerParams", None)
                             or pltpu.TPUCompilerParams)(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )

        def dot(a, b):
            return mm(a, b)
        _chain_tops(m, k, n, it, dot, in_dtype, in_dtype, label)

    mk_mm(jnp.int8, jnp.int32, jnp.int32,
          f"pl_s8_{bm}x{bk}x{bn}")
    mk_mm(jnp.bfloat16, jnp.float32, jnp.bfloat16,
          f"pl_bf16_{bm}x{bk}x{bn}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["shapes", "shapes2", "variants",
                                     "pallas", "int4"])
    args = ap.parse_args()
    {"shapes": mode_shapes, "shapes2": mode_shapes2, "variants": mode_variants,
     "pallas": mode_pallas, "int4": mode_int4}[args.mode]()


if __name__ == "__main__":
    main()
