"""A/B the full decode megakernel against the production decode_step
(fused append kernel + XLA weight fusions) at the bench operating point.

Both run a complete decode step over the int8 KV cache at a fixed fill
(cache_len stays constant across chained iterations — the same row is
rewritten, so every step reads the same live prefix, matching the filled-
cache profile convention of scripts/xprof_decode.py). Logits matmul and
embedding excluded from both sides (identical either way).

Env: PRESET 7b|3b, MB batch (80), FILL (1650), MITERS (20),
     M bucket (1920), MEGA_* tile knobs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from karanta_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from karanta_tpu.models.qwen25_vl.config import TextConfig
from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.ops.decode_stream import (decode_megakernel,
                                           pack_stream_params)
from karanta_tpu.ops.quantization import _quantize_impl
from karanta_tpu.ops.rotary import mrope_cos_sin
from karanta_tpu.ops.norms import rms_norm

PRESET = os.environ.get("PRESET", "7b")
if PRESET == "7b":
    CFG = TextConfig(vocab_size=152064, hidden_size=3584, num_layers=28,
                     num_heads=28, num_kv_heads=4, head_dim=128,
                     intermediate_size=18944, tie_word_embeddings=False)
else:
    CFG = TextConfig(vocab_size=151936, hidden_size=2048, num_layers=36,
                     num_heads=16, num_kv_heads=2, head_dim=128,
                     intermediate_size=11008, tie_word_embeddings=True)
B = int(os.environ.get("MB", 80))
M = int(os.environ.get("M", 1920))
FILL = int(os.environ.get("FILL", 1650))
ITERS = int(os.environ.get("MITERS", 20))
KTQ = int(os.environ.get("MEGA_KTQ", 128))
KT = int(os.environ.get("MEGA_KT", 128))
MT = int(os.environ.get("MEGA_MT", 256))
SPP = int(os.environ.get("MEGA_SPP", 2))
NBUF = int(os.environ.get("MEGA_NBUF", 2))
BLK = int(os.environ.get("MEGA_BLK", 512))

L, H = CFG.num_layers, CFG.hidden_size
QD = CFG.num_heads * CFG.head_dim
KVD = CFG.num_kv_heads * CFG.head_dim
FF = CFG.intermediate_size
WEIGHT_BYTES = L * (H * (QD + 2 * KVD) + QD * H + 3 * H * FF)
CACHE_BYTES = L * B * CFG.num_kv_heads * FILL * CFG.head_dim * 2
STEP_BYTES = WEIGHT_BYTES + CACHE_BYTES


def gen_quant(key, shape):
    @jax.jit
    def g(k):
        return _quantize_impl(jax.random.normal(k, shape, jnp.bfloat16)
                              * 0.02)
    out = g(key)
    jax.block_until_ready(out)
    return out


# one variant per process: both layouts at once (2 x 6.6 GB at the 7B
# point) would not leave room for the caches on the 16 GB chip
WHICH = (sys.argv[1] if len(sys.argv) > 1
         else os.environ.get("WHICH", "mega"))

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 16)
layers = {
    "ln1": jnp.ones((L, H), jnp.bfloat16),
    "ln2": jnp.ones((L, H), jnp.bfloat16),
    "attn": {
        "wq": gen_quant(ks[0], (L, H, QD)),
        "wk": gen_quant(ks[1], (L, H, KVD)),
        "wv": gen_quant(ks[2], (L, H, KVD)),
        "wo": gen_quant(ks[3], (L, QD, H)),
        "bq": jnp.zeros((L, QD), jnp.bfloat16),
        "bk": jnp.zeros((L, KVD), jnp.bfloat16),
        "bv": jnp.zeros((L, KVD), jnp.bfloat16),
    },
    "mlp": {
        "gate": gen_quant(ks[4], (L, H, FF)),
        "up": gen_quant(ks[5], (L, H, FF)),
        "down": gen_quant(ks[6], (L, FF, H)),
    },
}
qparams = {"layers": layers, "final_norm": jnp.ones((H, ), jnp.bfloat16)}
sp = None
if WHICH == "mega":
    # transpose/concat per leaf, dropping originals as we go
    sp = jax.jit(pack_stream_params, donate_argnums=0)(layers)
    jax.block_until_ready(sp)
    qparams = {"final_norm": qparams["final_norm"]}
    del layers

# build the filled cache directly (zeros-then-replace would transiently
# hold an extra 8.8 GB of dead zeros at the 7B point; randint at int8
# internally materializes 32-bit random bits — 4x the array — so use
# 8-bit bits and bitcast)
kv_shape = (L, B, CFG.num_kv_heads, M, CFG.head_dim)


@jax.jit
def _fill(k):
    k1, k2 = jax.random.split(k)
    kf = jax.lax.bitcast_convert_type(
        jax.random.bits(k1, kv_shape, jnp.uint8), jnp.int8)
    vf = jax.lax.bitcast_convert_type(
        jax.random.bits(k2, kv_shape, jnp.uint8), jnp.int8)
    return kf, vf


kfill, vfill = _fill(ks[7])
jax.block_until_ready((kfill, vfill))
cache = dec.QuantKVCache(kfill, vfill,
                         jnp.full(kv_shape[:-1], 0.05, jnp.bfloat16),
                         jnp.full(kv_shape[:-1], 0.05, jnp.bfloat16))
del kfill, vfill
cache_len = jnp.full((B,), FILL, jnp.int32)
positions = jnp.broadcast_to(cache_len[None, :], (3, B))
cos, sin = jax.vmap(
    lambda p: mrope_cos_sin(p[:, None], CFG.head_dim, CFG.mrope_section,
                            CFG.rope_theta),
    in_axes=1, out_axes=0)(positions)
cos = cos[:, 0, :]
sin = sin[:, 0, :]
x0 = jax.random.normal(ks[8], (B, H), jnp.bfloat16) * 0.3


def _norm(x):
    return (x * jax.lax.rsqrt(jnp.mean(
        jnp.square(x.astype(jnp.float32))) + 1e-6)).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("which",), donate_argnums=(1,))
def run(x, cache, which, params, spd):
    def body(carry, _):
        x, cache = carry
        if which == "current":
            h, cache = dec.decode_step(params, CFG, x[:, None, :],
                                       positions, cache, cache_len)
            x = h[:, 0, :]
        else:
            h, k, v, kss, vss = decode_megakernel(
                x, cos, sin, spd, cache.k, cache.v, cache.ks, cache.vs,
                cache_len, qd=QD, kvd=KVD, ktq=KTQ, kt=KT, mt=MT, spp=SPP,
                nbuf=NBUF, block=BLK, eps=CFG.rms_norm_eps)
            x = rms_norm(h, params["final_norm"], CFG.rms_norm_eps)
            cache = dec.QuantKVCache(k, v, kss, vss)
        return (_norm(x), cache), ()
    (x, cache), _ = jax.lax.scan(body, (x, cache), None, length=ITERS)
    return x, cache


def _sync(r):
    return float(np.asarray(jnp.sum(r.astype(jnp.float32))))


if __name__ == "__main__":
    name = WHICH
    t0 = time.perf_counter()
    x, cache = run(x0, cache, name, qparams, sp)
    _sync(x)
    print(f"compiled+warm {name} in {time.perf_counter() - t0:.1f}s",
          flush=True)
    if os.environ.get("COMPILE_ONLY"):
        sys.exit(0)
    for _ in range(4):
        x, cache = run(x0, cache, name, qparams, sp)
        _sync(x)
        t0 = time.perf_counter()
        x, cache = run(x0, cache, name, qparams, sp)
        _sync(x)
        dt = time.perf_counter() - t0
        per_ms = dt / ITERS * 1e3
        gbs = STEP_BYTES / (per_ms / 1e3) / 1e9
        print(f"{name:8s}: {per_ms:7.2f} ms/step -> {gbs:6.1f} GB/s eff "
              f"({gbs/8.2:.0f}% of 820)", flush=True)
    print("OK")
