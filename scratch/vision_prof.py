"""Vision tower component timing at bench page shape (5120 patches, d=80)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def t(fn, n=6):
    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
    sync(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.time() - t0) / n * 1e3

def main():
    enable_compilation_cache()
    from karanta_tpu.ops.attention import attention, window_attention
    rng = np.random.default_rng(0)
    S, H, D = 5120, 16, 80
    q = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, S, H, D)), jnp.bfloat16)
    mask = jnp.ones((1, S), jnp.float32)

    print(f"win-kernel (w=64): {t(lambda: window_attention(q, k, v, window=64, kv_mask=mask)):.2f} ms", flush=True)
    qb = q.reshape(80, 64, H, D); kb = k.reshape(80, 64, H, D); vb = v.reshape(80, 64, H, D)
    print(f"batched-dense win: {t(lambda: attention(qb, kb, vb)):.2f} ms", flush=True)
    print(f"full attn 5120:    {t(lambda: attention(q, k, v, kv_mask=mask)):.2f} ms", flush=True)

    # matmul stack of one vision layer at S tokens: qkv + o + mlp(3420)
    x = jnp.asarray(rng.normal(size=(S, 1280)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(size=(1280, 3840)), jnp.bfloat16)
    w_o = jnp.asarray(rng.normal(size=(1280, 1280)), jnp.bfloat16)
    w_up = jnp.asarray(rng.normal(size=(1280, 3420)), jnp.bfloat16)
    w_gate = jnp.asarray(rng.normal(size=(1280, 3420)), jnp.bfloat16)
    w_down = jnp.asarray(rng.normal(size=(3420, 1280)), jnp.bfloat16)
    @jax.jit
    def layer_mm(x):
        y = x @ w_qkv
        z = y[:, :1280] @ w_o
        h = jax.nn.silu(x @ w_gate) * (x @ w_up)
        return z + h @ w_down
    print(f"layer matmuls:     {t(lambda: layer_mm(x)):.2f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
