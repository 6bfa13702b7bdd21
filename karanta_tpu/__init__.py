"""karanta_tpu — a TPU-native OCR framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
The-African-Research-Collective/karanta-ocr (reference mounted at /root/reference):
PDF rasterization + preprocessing, document classifiers, a Qwen2.5-VL-architecture
OCR VLM, a continuous-batching TPU inference server speaking the OpenAI protocol,
a scale-out async OCR pipeline with Dolma JSONL output, bulk job sharding, a
training stack (pjit-sharded, bf16, LoRA, Muon/AdamW), and a bench harness.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  ops/        Pallas kernels + core jax ops (flash attn, paged attn, image prep)
  parallel/   device mesh, sharding rules, collectives
  models/     Qwen2.5-VL VLM + ViT document classifier, HF weight conversion
  inference/  paged KV cache, continuous batching engine, OpenAI HTTP server
  training/   pjit train loop, optimizers (AdamW/Muon), data pipeline, checkpoints
  pipeline/   scale-out OCR orchestrator (work queue, retry ladder, Dolma docs)
  pdf/        PDF primitives (poppler front-end, anchor-text extraction)
  prompts/    prompt templates + response-format schemas
  bulk/       sharded bulk-processing job store + dispatcher
  bench/      OCR method benchmark harness
  data/       corpus tooling (converters, samplers, splitters)
"""

from karanta_tpu.version import VERSION, __version__  # noqa: F401
