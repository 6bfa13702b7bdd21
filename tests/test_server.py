"""Inference-server tests: HTTP surface, continuous batching, and the full
pipeline -> server -> engine integration loop (tiny random model)."""

import asyncio
import base64
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig
from karanta_tpu.inference.server import InferenceServer
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params
from karanta_tpu.pipeline.http import aget, apost


def _engine():
    tok = ByteTokenizer()
    cfg = tiny_config(vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=256, decode_chunk=8,
                        prefill_buckets=(64, 128, 256),
                        image_token_buckets=(16, 64), dtype=jnp.float32)
    return Engine(params, cfg, tok, ecfg)


def _chat_body(text="hello", max_tokens=8, with_image=False):
    content = [{"type": "text", "text": text}]
    if with_image:
        from PIL import Image

        img = Image.fromarray(np.random.default_rng(0).integers(
            0, 255, (56, 56, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        content.append({"type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{b64}"}})
    return {"model": "karanta-ocr", "max_tokens": max_tokens,
            "temperature": 0.0,
            "messages": [{"role": "user", "content": content}]}


@pytest.fixture(scope="module")
def server_url():
    server = InferenceServer(_engine(), model_name="tiny-test")
    loop = asyncio.new_event_loop()

    import threading

    started = threading.Event()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def boot():
            port = await server.start("127.0.0.1", 0)
            holder["port"] = port
            started.set()

        loop.run_until_complete(boot())
        loop.run_forever()

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    started.wait(timeout=30)
    yield f"http://127.0.0.1:{holder['port']}"
    loop.call_soon_threadsafe(loop.stop)


class TestHTTPSurface:
    def test_health_and_models(self, server_url):
        async def go():
            status, _ = await aget(f"{server_url}/health")
            assert status == 200
            status, body = await aget(f"{server_url}/v1/models")
            return status, json.loads(body)

        status, models = asyncio.run(go())
        assert status == 200
        assert models["data"][0]["id"] == "tiny-test"

    def test_metrics(self, server_url):
        async def go():
            return await aget(f"{server_url}/metrics")

        status, body = asyncio.run(go())
        assert status == 200
        data = json.loads(body)
        assert {"running", "waiting"} <= set(data)

    def test_chat_completion(self, server_url):
        async def go():
            return await apost(f"{server_url}/v1/chat/completions",
                               _chat_body())

        status, body = asyncio.run(go())
        assert status == 200
        data = json.loads(body)
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["finish_reason"] in ("stop", "length")
        assert data["usage"]["total_tokens"] > 0

    def test_multimodal_completion(self, server_url):
        async def go():
            return await apost(f"{server_url}/v1/chat/completions",
                               _chat_body(with_image=True))

        status, body = asyncio.run(go())
        assert status == 200
        assert json.loads(body)["usage"]["prompt_tokens"] > 20

    def test_concurrent_requests_batch(self, server_url):
        async def go():
            results = await asyncio.gather(*[
                apost(f"{server_url}/v1/chat/completions",
                      _chat_body(text=f"req {i}", max_tokens=6))
                for i in range(5)
            ])
            return results

        results = asyncio.run(go())
        assert all(status == 200 for status, _ in results)

    def test_two_guided_regexes_concurrently(self, server_url):
        """Two in-flight requests with different guided regexes decode
        concurrently (shared state arena); both responses match their own
        constraints (OpenAI-compatible per-request guiding)."""
        from karanta_tpu.inference.guided import compile_regex, match_full

        p1, p2 = r"(?:yes|no): [0-9]{1,3}", r"[a-f]{2}-[0-9]{2}"

        async def go():
            def body(pattern):
                b = _chat_body(text="classify", max_tokens=24)
                b["temperature"] = 1.0
                b["guided_regex"] = pattern
                return b

            return await asyncio.gather(
                apost(f"{server_url}/v1/chat/completions", body(p1)),
                apost(f"{server_url}/v1/chat/completions", body(p2)))

        (s1, b1), (s2, b2) = asyncio.run(go())
        assert s1 == 200 and s2 == 200
        t1 = json.loads(b1)["choices"][0]["message"]["content"]
        t2 = json.loads(b2)["choices"][0]["message"]["content"]
        assert match_full(compile_regex(p1), t1.encode()), t1
        assert match_full(compile_regex(p2), t2.encode()), t2

    def test_bad_request(self, server_url):
        async def go():
            return await apost(f"{server_url}/v1/chat/completions",
                               {"not_messages": 1})

        status, _ = asyncio.run(go())
        assert status == 400

    def test_streaming_sse(self, server_url):
        async def go():
            body = _chat_body(max_tokens=6)
            body["stream"] = True
            return await apost(f"{server_url}/v1/chat/completions", body)

        status, raw = asyncio.run(go())
        assert status == 200
        text = raw.decode()
        assert "chat.completion.chunk" in text
        assert '"role": "assistant"' in text
        assert "[DONE]" in text
        # a finish_reason arrives before DONE
        assert '"finish_reason": "stop"' in text or \
            '"finish_reason": "length"' in text

    def test_unknown_route(self, server_url):
        async def go():
            return await aget(f"{server_url}/nope")

        status, _ = asyncio.run(go())
        assert status == 404


class TestPipelineIntegration:
    def test_pipeline_against_real_server(self, server_url, tmp_path):
        """Full loop: scanned PDF -> pipeline -> our engine -> result file.

        The tiny random model emits non-JSON text, so pages fall back to
        anchor text — the pipeline must still complete, write the group's
        result marker, and resume idempotently."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes
        from karanta_tpu.pipeline.runner import PipelineArgs, amain

        img = Image.fromarray(np.random.default_rng(1).integers(
            180, 255, (120, 90, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        pdf_path = tmp_path / "scan.pdf"
        pdf_path.write_bytes(convert_image_to_pdf_bytes(buf.getvalue()))

        args = PipelineArgs(
            workspace=str(tmp_path / "ws"), pdfs=[str(pdf_path)],
            server=f"{server_url}/v1", workers=1, max_page_retries=2,
            max_page_error_rate=1.0, target_longest_image_dim=128)
        asyncio.run(amain(args))

        results = os.listdir(os.path.join(args.workspace, "results"))
        assert len(results) == 1  # group completion marker written


class TestLogprobs:
    def test_chat_completion_with_logprobs(self, server_url):
        import json as jsonmod
        import urllib.request

        body = jsonmod.dumps({
            "model": "x",
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 5, "temperature": 0,
            "logprobs": True, "top_logprobs": 3,
        }).encode()
        req = urllib.request.Request(
            f"{server_url}/v1/chat/completions", body,
            {"Content-Type": "application/json"})
        out = jsonmod.load(urllib.request.urlopen(req, timeout=300))
        lp = out["choices"][0]["logprobs"]["content"]
        assert len(lp) == 5
        for entry in lp:
            assert entry["logprob"] is None or entry["logprob"] <= 0.0
            if entry["logprob"] is not None:
                assert len(entry["top_logprobs"]) == 3
                tops = [t["logprob"] for t in entry["top_logprobs"]]
                assert tops == sorted(tops, reverse=True)
                # chosen token's logprob cannot beat the best alternative
                assert entry["logprob"] <= tops[0] + 1e-5


class TestNativeCheckpointServing:
    def test_build_engine_from_native_checkpoint(self, tmp_path):
        """--native-checkpoint restores trainer-saved params bit-exactly
        (float leaves cast to the engine dtype, ints untouched)."""
        import argparse

        import optax

        from karanta_tpu.inference.server import build_engine_from_args
        from karanta_tpu.training.checkpoint import save_checkpoint
        from karanta_tpu.training.train_step import create_train_state

        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
        state = create_train_state(params, optax.adamw(1e-4))
        save_checkpoint(str(tmp_path), 7, state)

        ns = argparse.Namespace(
            model_path=None, native_checkpoint=str(tmp_path),
            tokenizer_path=None, preset="tiny",
            max_batch_size=1, max_model_len=128, decode_chunk=4,
            quantize=None, kv_quantize=None, act_quant=None,
            vision_quant=None, prefix_cache=False, speculative_ngram=0,
            tensor_parallel_size=1, data_parallel_size=1)
        engine, name = build_engine_from_args(ns)
        assert name == "native-step_7"
        got = jax.tree.leaves(engine.params)
        want = jax.tree.leaves(params)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g, np.float32),
                                          np.asarray(w, np.float32))


class TestExtractDataImages:
    """Raw-body base64 extraction (the HTTP host fast path): payloads are
    sliced off the wire bytes before JSON parsing; anything surprising
    falls back to the slow path untouched."""

    def test_extracts_and_replaces(self):
        import base64 as b64

        from karanta_tpu.inference.server import extract_data_images

        raw1, raw2 = b"\x89PNG fake bytes 1", b"second image bytes"
        body = json.dumps({"messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {
                "url": "data:image/png;base64,"
                       + b64.b64encode(raw1).decode()}},
            {"type": "text", "text": "and data:image/ in text is fine"},
            {"type": "image_url", "image_url": {
                "url": "data:image/jpeg;base64,"
                       + b64.b64encode(raw2).decode()}},
        ]}]}).encode()
        new_body, images = extract_data_images(body)
        assert images == [raw1, raw2]
        payload = json.loads(new_body)  # still valid JSON
        urls = [item["image_url"]["url"]
                for item in payload["messages"][0]["content"]
                if item["type"] == "image_url"]
        assert urls == ["data:image/png;base64,KARANTARAW0",
                        "data:image/jpeg;base64,KARANTARAW1"]

    def test_escaped_payload_falls_back(self):
        from karanta_tpu.inference.server import extract_data_images

        # an escape sequence inside the payload: not plain base64 -> leave it
        body = b'{"url": "data:image/png;base64,abc\\/def"}'
        new_body, images = extract_data_images(body)
        assert new_body == body and images == []

    def test_sentinel_resolves_in_chat_layer(self):
        from karanta_tpu.inference.chat import parse_openai_messages

        raw = b"raw image bytes"
        messages = [{"role": "user", "content": [
            {"type": "image_url", "image_url": {
                "url": "data:image/png;base64,KARANTARAW0"}}]}]
        parsed = parse_openai_messages(messages, raw_images=[raw])
        assert parsed.images == [raw]


class TestSmallPresetServing:
    def test_native_checkpoint_small_preset(self, tmp_path):
        """--preset small serves a native small-config checkpoint with the
        byte tokenizer (the mid-scale closed-loop serving path)."""
        import argparse

        import optax

        from karanta_tpu.inference.server import build_engine_from_args
        from karanta_tpu.models.qwen25_vl.config import small_config
        from karanta_tpu.training.checkpoint import save_checkpoint
        from karanta_tpu.training.train_step import create_train_state

        tok = ByteTokenizer()
        cfg = small_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
        state = create_train_state(params, optax.adamw(1e-4))
        save_checkpoint(str(tmp_path), 3, state)

        ns = argparse.Namespace(
            model_path=None, native_checkpoint=str(tmp_path),
            tokenizer_path=None, preset="small",
            max_batch_size=1, max_model_len=128, decode_chunk=4,
            quantize=None, kv_quantize=None, act_quant=None,
            vision_quant=None, prefix_cache=False, speculative_ngram=0,
            tensor_parallel_size=1, data_parallel_size=1)
        engine, name = build_engine_from_args(ns)
        assert name == "native-step_3"
        assert engine.cfg.text.hidden_size == 256

    def test_full_preset_still_requires_tokenizer(self, tmp_path):
        import argparse

        import optax
        import pytest as _pytest

        from karanta_tpu.inference.server import build_engine_from_args
        from karanta_tpu.training.checkpoint import save_checkpoint
        from karanta_tpu.training.train_step import create_train_state

        params = init_params(tiny_config(vocab_size=272),
                             jax.random.PRNGKey(0), dtype=jnp.float32)
        save_checkpoint(str(tmp_path), 1,
                        create_train_state(params, optax.adamw(1e-4)))
        ns = argparse.Namespace(
            model_path=None, native_checkpoint=str(tmp_path),
            tokenizer_path=None, preset="qwen2.5-vl-3b",
            max_batch_size=1, max_model_len=128, decode_chunk=4,
            quantize=None, kv_quantize=None, act_quant=None,
            vision_quant=None, prefix_cache=False, speculative_ngram=0,
            tensor_parallel_size=1, data_parallel_size=1)
        with _pytest.raises(SystemExit, match="tokenizer"):
            build_engine_from_args(ns)
