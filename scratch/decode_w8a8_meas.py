"""A/B the decode-shape weight stream: weight-only int8 dequant (qmm) vs
W8A8 (dynamic per-token int8 activations, int8 MXU dot).

The filled-cache decode trace (B80, M1920, int8 KV) shows the non-attention
fusions at ~11.4 ms/step for a ~6.6 GB weight stream = ~580 GB/s, well under
the ~820 GB/s the append kernel's ring DMA reaches. If the int8->bf16
dequant fused into the dot is the limiter, consuming the weights as int8
directly (W8A8) should lift the stream toward roofline.

Shapes: one 7B decode layer's matmul set at B=80, iterated with a forced
dependency chain inside ONE jit (standalone timing loops over the tunnel
measure dispatch, not kernels).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from karanta_tpu.utils.compile_cache import enable_compilation_cache
from karanta_tpu.ops.quantization import quantize_weight, matmul_w8a8, matmul as qmm

enable_compilation_cache()

B = int(os.environ.get("MB", 80))
H = 3584
QKV = H + 2 * 512
FF = 18944
ITERS = int(os.environ.get("MITERS", 30))

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
wq = quantize_weight(jax.random.normal(ks[0], (H, QKV), jnp.bfloat16) * 0.02)
wo = quantize_weight(jax.random.normal(ks[1], (H, H), jnp.bfloat16) * 0.02)
wg = quantize_weight(jax.random.normal(ks[2], (H, FF), jnp.bfloat16) * 0.02)
wu = quantize_weight(jax.random.normal(ks[3], (H, FF), jnp.bfloat16) * 0.02)
wd = quantize_weight(jax.random.normal(ks[4], (FF, H), jnp.bfloat16) * 0.02)
x0 = jax.random.normal(ks[5], (B, H), jnp.bfloat16)

LAYER_BYTES = (H * QKV + H * H + 2 * H * FF + FF * H)  # int8 weights


def layer(mm, x):
    a = mm(x, wq)[:, :H]          # qkv proj (take q part to keep shape)
    x = x + mm(a, wo)
    h = jax.nn.silu(mm(x, wg)) * mm(x, wu)
    x = x + mm(h, wd)
    return x


@partial(jax.jit, static_argnames=("which",))
def run(x, which):
    mm = matmul_w8a8 if which == "w8a8" else qmm
    def body(i, x):
        return layer(mm, x) * 0.999  # keep magnitudes bounded
    return jax.lax.fori_loop(0, ITERS, body, x)


for which in ("qmm", "w8a8", "qmm", "w8a8"):
    r = run(x0, which)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run(x0, which)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    per = dt / ITERS * 1e3
    gbs = LAYER_BYTES / (per / 1e3) / 1e9
    print(f"{which:5s}: {per:7.3f} ms/layer-iter  -> {gbs:6.1f} GB/s weight stream",
          flush=True)
print("OK")
