"""Split the 330ms fused prefill: H2D transfer / patchify / fused executable."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def t(fn, n=4):
    """block_until_ready is unreliable over the axon tunnel: force a D2H
    readback of a reduced scalar to guarantee completion."""
    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
    sync(fn())  # warm
    t0 = time.time()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.time() - t0) / n * 1e3

def main():
    enable_compilation_cache()
    from bench import make_page_png
    from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import qwen25_vl_3b
    from karanta_tpu.models.qwen25_vl.model import init_params
    from karanta_tpu.ops.image_prep import patchify

    cfg = qwen25_vl_3b()
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ecfg = EngineConfig(max_batch_size=8, max_seq_len=4096, decode_chunk=64,
                        prefill_buckets=(2048, 4096), image_token_buckets=(2048,),
                        dtype=jnp.bfloat16, quantize="int8")
    engine = Engine(params, cfg, ByteTokenizer(), ecfg)
    del params

    page = make_page_png()
    messages = [{"role": "user", "content": [
        {"type": "text", "text": "Return the plain text representation of this"
                                 " document as if you were reading it naturally.\n"},
        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{page}"}},
    ]}]
    prep = engine.prepare(GenRequest(messages=messages, max_tokens=8,
                                     temperature=0.0, request_id="p"))
    feed = prep.image_feeds[0]
    plan, layout = feed["plan"], feed["layout"]
    img = feed["image_u8"]
    print(f"image_u8 {img.shape} {img.nbytes/1e6:.1f} MB", flush=True)

    print(f"H2D image_u8: {t(lambda: jax.device_put(img)):.1f} ms", flush=True)
    img_dev = jax.device_put(img)
    pf = lambda x: patchify(x, grid_h=plan.grid_h, grid_w=plan.grid_w,
                            pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
                            out_dtype=ecfg.dtype)
    print(f"patchify (host np in): {t(lambda: pf(jnp.asarray(img))):.1f} ms", flush=True)
    print(f"patchify (device in): {t(lambda: pf(img_dev)):.1f} ms", flush=True)

    pix = pf(img_dev)
    s_pad = 2048
    s = len(prep.ids)
    ids = np.zeros((s_pad,), np.int32); ids[:s] = prep.ids
    positions = np.zeros((3, s_pad), np.int32); positions[:, :s] = prep.positions
    kv_mask = np.zeros((s_pad,), np.float32); kv_mask[:s] = 1.0
    img_pos = np.full((feed["n_pad"],), s_pad, np.int32)
    img_pos[: layout.num_merged] = np.flatnonzero(prep.ids == engine.tok.image_pad_id)
    args = [jax.device_put(x) for x in
            (pix, jnp.asarray(layout.perm), jnp.asarray(layout.valid),
             jnp.asarray(layout.pos_hw), jnp.asarray(feed["extract"]),
             jnp.asarray(ids), jnp.asarray(positions), jnp.asarray(kv_mask),
             jnp.asarray(img_pos), jnp.asarray(s, jnp.int32))]
    jax.block_until_ready(args)
    fused = lambda: engine._prefill_fused_jit(engine.params, *args,
                                              n_windows=layout.n_windows)[0]
    print(f"fused exec (staged args): {t(fused):.1f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
