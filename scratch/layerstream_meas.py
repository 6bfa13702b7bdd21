"""A/B the dense decode megakernel (ops/decode_stream.dense_stream) against
XLA's per-layer fusion stream at the 7B bench operating point.

Both run the SAME math: 28 layers x (rms -> qkv int8 matmul -> [attention
stubbed with a per-layer input] -> o proj -> rms -> fused SwiGLU MLP), int8
weights with per-output-channel scales, B=80 decode rows. ~6.6 GB of weight
reads per iteration — the stream whose 75%-of-roofline XLA efficiency and
per-layer launch overhead the megakernel exists to beat.

Chained ITERS inside one jit (tunnel dispatch would otherwise dominate).

Env: MB batch (80), MITERS (30), PRESET 7b|3b.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial

from karanta_tpu.utils.compile_cache import enable_compilation_cache
from karanta_tpu.ops.quantization import quantize_weight
from karanta_tpu.ops.decode_stream import dense_stream, pack_stream_params
from karanta_tpu.ops.norms import rms_norm

enable_compilation_cache()

PRESET = os.environ.get("PRESET", "7b")
if PRESET == "7b":
    L, H, QD, KVD, FF = 28, 3584, 3584, 512, 18944
else:
    L, H, QD, KVD, FF = 36, 2048, 2048, 256, 11008
B = int(os.environ.get("MB", 80))
ITERS = int(os.environ.get("MITERS", 30))
QKV = QD + 2 * KVD
LAYER_BYTES = H * QKV + QD * H + 3 * H * FF
TOTAL = L * LAYER_BYTES


def gen_quant(key, shape):
    """Generate a quantized leaf without holding extra bf16 copies."""
    @jax.jit
    def g(k):
        w = jax.random.normal(k, shape, jnp.bfloat16) * 0.02
        from karanta_tpu.ops.quantization import _quantize_impl
        return _quantize_impl(w)
    out = g(key)
    jax.block_until_ready(out)
    return out


key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 12)
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
sp = jax.jit(pack_stream_params)(layers)
jax.block_until_ready(sp)
del layers  # free the untransposed gate/up copies
x0 = jax.random.normal(ks[7], (B, H), jnp.bfloat16)
attn0 = jax.random.normal(ks[8], (L, B, H), jnp.bfloat16) * 0.1


def xla_layers(x, sp, attn_out):
    """XLA reference: lax.scan over stacked layers, same math."""
    def body(x, inp):
        lp, ao = inp
        xn = rms_norm(x, lp["ln1"])
        qkv = (jnp.matmul(xn, lp["wqkv"].astype(x.dtype),
                          preferred_element_type=jnp.float32)
               * lp["qs"][0] + lp["bias"].astype(jnp.float32))
        o = jnp.matmul(ao, lp["wo"].astype(x.dtype),
                       preferred_element_type=jnp.float32) * lp["os"][0]
        x = (x.astype(jnp.float32) + o).astype(x.dtype)
        xn = rms_norm(x, lp["ln2"])
        g = jax.lax.dot_general(xn, lp["wg_t"].astype(x.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = g * lp["gs"][0]
        u = jax.lax.dot_general(xn, lp["wu_t"].astype(x.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = u * lp["us"][0]
        hmid = (jax.nn.silu(g) * u).astype(x.dtype)
        d = jnp.matmul(hmid, lp["wd"].astype(x.dtype),
                       preferred_element_type=jnp.float32) * lp["ds"][0]
        x = (x.astype(jnp.float32) + d).astype(x.dtype)
        return x, qkv[:, :1].astype(x.dtype)  # keep qkv live
    x, qs = jax.lax.scan(body, x, (sp, attn_out))
    return x + jnp.mean(qs)


def _norm(x):
    return (x * jax.lax.rsqrt(jnp.mean(
        jnp.square(x.astype(jnp.float32))) + 1e-6)).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("which",))
def run(x, sp, attn_out, which):
    def body(i, x):
        if which == "xla":
            o = xla_layers(x, sp, attn_out)
        else:
            xf, qkv = dense_stream(x, attn_out, sp)
            o = xf + jnp.mean(qkv[:, :, :1])  # keep qkv output live
        return _norm(o)
    return jax.lax.fori_loop(0, ITERS, body, x)


def _sync(r):
    """block_until_ready can return before remote axon execution finishes;
    a host readback is the only reliable fence (see skills/verify)."""
    import numpy as np

    return float(np.asarray(jnp.sum(r.astype(jnp.float32))))


if __name__ == "__main__":
    for name in ("xla", "stream"):
        t0 = time.perf_counter()
        _sync(run(x0, sp, attn0, name))
        print(f"compiled+warm {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    if os.environ.get("COMPILE_ONLY"):
        sys.exit(0)
    for name in ("xla", "stream") * 3:
        _sync(run(x0, sp, attn0, name))
        t0 = time.perf_counter()
        _sync(run(x0, sp, attn0, name))
        dt = time.perf_counter() - t0
        per_ms = dt / ITERS * 1e3
        gbs = TOTAL / (per_ms / 1e3) / 1e9
        print(f"{name:7s}: {per_ms:7.2f} ms/step-iter -> {gbs:6.1f} GB/s "
              f"({gbs/8.2:.0f}% of 820)", flush=True)
    print("OK")
