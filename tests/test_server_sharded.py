"""Multi-chip serving, end to end: the OpenAI HTTP server in front of an
engine sharded over a (data, fsdp, model) mesh must serve the full surface
and produce bit-identical greedy output to the single-device server.

Reference parity: vLLM's --tensor-parallel-size / --data-parallel-size
serving (/root/reference/karanta/pipeline.py:719-722, 1231-1244); here the
mesh is a jax.sharding.Mesh and XLA inserts the collectives.
"""

import asyncio
import base64
import io
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig
from karanta_tpu.inference.server import InferenceServer
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params
from karanta_tpu.parallel.mesh import MeshConfig, create_mesh
from karanta_tpu.pipeline.http import aget, apost


def _make_engine(mesh=None):
    tok = ByteTokenizer()
    cfg = tiny_config(vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=256, decode_chunk=8,
                        prefill_buckets=(64, 128, 256),
                        image_token_buckets=(16, 64), dtype=jnp.float32)
    return Engine(params, cfg, tok, ecfg, mesh=mesh)


def _boot(engine, name):
    server = InferenceServer(engine, model_name=name)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def go():
            holder["port"] = await server.start("127.0.0.1", 0)
            started.set()

        loop.run_until_complete(go())
        loop.run_forever()

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    assert started.wait(timeout=60)
    return f"http://127.0.0.1:{holder['port']}", loop


def _chat_body(text="read this page", max_tokens=12, with_image=False):
    content = [{"type": "text", "text": text}]
    if with_image:
        from PIL import Image

        img = Image.fromarray(np.random.default_rng(3).integers(
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
def servers():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    sharded_url, sharded_loop = _boot(_make_engine(mesh=mesh), "tiny-tp")
    single_url, single_loop = _boot(_make_engine(), "tiny-single")
    yield sharded_url, single_url
    sharded_loop.call_soon_threadsafe(sharded_loop.stop)
    single_loop.call_soon_threadsafe(single_loop.stop)


def _post(url, body):
    async def go():
        return await apost(f"{url}/v1/chat/completions", body)

    return asyncio.run(go())


class TestShardedServer:
    def test_surface_up(self, servers):
        sharded_url, _ = servers

        async def go():
            return (await aget(f"{sharded_url}/health"),
                    await aget(f"{sharded_url}/metrics"))

        (hs, _), (ms, mbody) = asyncio.run(go())
        assert hs == 200 and ms == 200
        assert {"running", "waiting"} <= set(json.loads(mbody))

    def test_greedy_text_matches_single_device(self, servers):
        sharded_url, single_url = servers
        body = _chat_body()
        s_status, s_body = _post(sharded_url, body)
        u_status, u_body = _post(single_url, body)
        assert s_status == 200 and u_status == 200
        s, u = json.loads(s_body), json.loads(u_body)
        assert s["choices"][0]["message"]["content"] == \
            u["choices"][0]["message"]["content"]
        assert s["usage"] == u["usage"]

    def test_greedy_multimodal_matches_single_device(self, servers):
        sharded_url, single_url = servers
        body = _chat_body(with_image=True, max_tokens=8)
        s_status, s_body = _post(sharded_url, body)
        u_status, u_body = _post(single_url, body)
        assert s_status == 200 and u_status == 200
        s, u = json.loads(s_body), json.loads(u_body)
        assert s["usage"]["prompt_tokens"] > 20
        assert s["choices"][0]["message"]["content"] == \
            u["choices"][0]["message"]["content"]

    def test_concurrent_batch_on_mesh(self, servers):
        sharded_url, _ = servers

        async def go():
            return await asyncio.gather(*[
                apost(f"{sharded_url}/v1/chat/completions",
                      _chat_body(text=f"page {i}", max_tokens=6))
                for i in range(4)
            ])

        results = asyncio.run(go())
        assert all(status == 200 for status, _ in results)
        assert all(json.loads(body)["usage"]["completion_tokens"] > 0
                   for _, body in results)
