"""Random serving weights for throughput benches, OOM-safe on 16 GB chips.

Decode/prefill cost is weight-value independent, so random weights measure
the same throughput a real checkpoint would (the reference's baseline is
vLLM serving an FP8 checkpoint — pipeline.py:1128-1131 — whose kernel work
is likewise value-independent). Shared by bench.py (engine bench) and
karanta_tpu/bench/pipeline_bench.py (full-pipeline bench).
"""

from __future__ import annotations


def init_params_bench(cfg, dtype, quantize):
    """Random serving params; with quantize='int8' the decoder matrices are
    GENERATED directly in quantized form, leaf by leaf inside jit.

    The naive path (full bf16 init, then Engine quantizes) keeps the bf16
    tree alive while the int8 copies build — for the 7B that is ~15 GB + 6.5
    GB and the 16 GB chip OOMs at the first executable. Generating each
    quantized leaf directly caps the peak at one leaf's temporaries.
    Returns (params, engine_quantize_mode)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from karanta_tpu.models.qwen25_vl.model import init_params

    if quantize != "int8":
        return init_params(cfg, jax.random.PRNGKey(0), dtype=dtype), quantize

    from karanta_tpu.ops.quantization import _quantize_impl

    shapes = jax.eval_shape(lambda k: init_params(cfg, k, dtype=dtype),
                            jax.random.PRNGKey(0))
    seeds = itertools.count(1)

    def gen(sd):
        seed = next(seeds)
        return jax.jit(lambda: (jax.random.normal(
            jax.random.PRNGKey(seed), sd.shape, jnp.float32)
            * 0.02).astype(sd.dtype))()

    def gen_tree(tree):
        return jax.tree.map(gen, tree)

    def gen_q(sd):
        seed = next(seeds)
        fn = jax.jit(lambda: _quantize_impl((jax.random.normal(
            jax.random.PRNGKey(seed), sd.shape, jnp.float32)
            * 0.02).astype(sd.dtype)))
        return fn()

    ts = shapes["text"]
    layers = {}
    for name, sub in ts["layers"].items():
        if name == "attn":
            layers[name] = {n: (gen_q(v) if n in ("wq", "wk", "wv", "wo")
                                else gen(v)) for n, v in sub.items()}
        elif name == "mlp":
            layers[name] = {n: gen_q(v) for n, v in sub.items()}
        else:
            layers[name] = gen_tree(sub)
    text = {n: gen_tree(v) for n, v in ts.items()
            if n not in ("layers", "lm_head")}
    text["layers"] = layers
    if "lm_head" in ts:
        text["lm_head"] = gen_q(ts["lm_head"])
    else:  # tied embeddings serve logits off a transposed int8 table
        vocab, hidden = ts["embed"].shape
        text["logits_head"] = gen_q(
            jax.ShapeDtypeStruct((hidden, vocab), dtype))
    # params are pre-quantized: the engine must not quantize again
    return {"visual": gen_tree(shapes["visual"]), "text": text}, None
