"""Vision-encode vs decoder-prefill split of the fused executable."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def t(fn, n=4):
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
    from bench import make_page_png
    from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import qwen25_vl_3b
    from karanta_tpu.models.qwen25_vl.model import init_params
    from karanta_tpu.models.qwen25_vl import vision as vis
    from karanta_tpu.ops.image_prep import patchify

    cfg = qwen25_vl_3b()
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ecfg = EngineConfig(max_batch_size=8, max_seq_len=1920, decode_chunk=64,
                        prefill_buckets=(1536, 2048), image_token_buckets=(2048,),
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
    pix = patchify(jax.device_put(feed["image_u8"]), grid_h=plan.grid_h,
                   grid_w=plan.grid_w, pad_grid_h=plan.pad_grid_h,
                   pad_grid_w=plan.pad_grid_w, out_dtype=ecfg.dtype)
    perm = jax.device_put(jnp.asarray(layout.perm))
    valid = jax.device_put(jnp.asarray(layout.valid))
    pos_hw = jax.device_put(jnp.asarray(layout.pos_hw))
    print(f"grid {plan.grid_h}x{plan.grid_w} pad {plan.pad_grid_h}x{plan.pad_grid_w} "
          f"patch_tokens={pix.shape} merged={layout.num_merged} "
          f"n_windows={layout.n_windows}", flush=True)

    fn_vis = lambda: engine._encode_image_jit(
        engine.params, pix, perm, valid, pos_hw,
        jax.device_put(jnp.asarray(feed["extract"])),
        n_windows=layout.n_windows)
    print(f"vision encode: {t(fn_vis):.1f} ms", flush=True)

    s = len(prep.ids); s_pad = 1536
    ids = np.zeros((s_pad,), np.int32); ids[:s] = prep.ids
    positions = np.zeros((3, s_pad), np.int32); positions[:, :s] = prep.positions
    kv_mask = np.zeros((s_pad,), np.float32); kv_mask[:s] = 1.0
    n_img = feed["n_pad"]
    img_tokens = jax.device_put(jnp.zeros((n_img, cfg.vision.out_hidden_size),
                                          ecfg.dtype))
    img_pos = np.full((n_img,), s_pad, np.int32)
    img_pos[: layout.num_merged] = np.flatnonzero(prep.ids == engine.tok.image_pad_id)
    args = [jax.device_put(jnp.asarray(x)) for x in
            (ids, positions, kv_mask)]
    fn_pref = lambda: engine._prefill_jit(engine.params, args[0], args[1],
                                          args[2], img_tokens,
                                          jax.device_put(jnp.asarray(img_pos)),
                                          jnp.asarray(s, jnp.int32))[0]
    print(f"decoder prefill (2048): {t(fn_pref):.1f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
