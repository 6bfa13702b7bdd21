"""OpenAI-compatible TPU inference server with continuous batching.

Native replacement for the reference's `vllm serve` subprocess + fleet
launchers (karanta/pipeline.py:707-913, scripts/start_*_vllm_servers.sh).
Speaks the exact HTTP surface the pipeline and bulk layers poll:
  GET  /health                     -> 200 (vllm_client.py:59-60)
  GET  /v1/models                  -> model list (pipeline.py:888)
  POST /v1/chat/completions        -> chat completion (pipeline.py:278)
  GET  /metrics                    -> {"running": N, "waiting": M} — the queue
                                      depths the reference scrapes from vLLM
                                      logs for admission control
                                      (pipeline.py:782-800)

Design: one background engine task owns the device. New requests are admitted
into free decode slots between decode chunks (continuous batching); prefills
interleave with decode at chunk boundaries. All device work is serialized on
one thread (JAX dispatch is not thread-safe across a shared engine state);
HTTP handling stays fully async.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import dataclasses
import json
import logging
import time
import uuid
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Optional

from karanta_tpu.inference.chat import RAW_IMAGE_SENTINEL
from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest

logger = logging.getLogger("karanta_tpu.server")


def extract_data_images(body: bytes) -> tuple[bytes, list[bytes]]:
    """Pull base64 data-URL payloads out of a raw request body BEFORE JSON
    parsing, replacing each with a short sentinel reference.

    A 1288 px page is a ~1.7 MB base64 string; json.loads must scan it
    byte-by-byte for escapes and materialize it as a str, and the chat
    layer then b64-decodes from that str — measured milliseconds per page
    of pure host overhead on the serving path. The base64 alphabet contains
    no JSON escapes, so the payload can be sliced straight off the wire
    bytes and b64-decoded zero-copy; anything surprising (an escape inside
    the payload, malformed base64) falls back to the slow path untouched.
    """
    images: list[bytes] = []
    out = bytearray()
    view = memoryview(body)
    copied = 0   # bytes [0, copied) already appended to `out`
    search = 0   # where to look for the next data URL
    while True:
        i = body.find(b"data:image/", search)
        if i < 0:
            break
        j = body.find(b";base64,", i, i + 40)
        if j < 0:
            search = i + 11
            continue
        start = j + 8
        k = body.find(b'"', start)
        if k < 0:
            break
        search = k
        payload = view[start:k]
        if b"\\" in payload:  # escaped char inside: not plain base64
            continue
        try:
            raw = base64.b64decode(payload)
        except Exception:
            continue
        out += view[copied:start]
        out += f"{RAW_IMAGE_SENTINEL}{len(images)}".encode()
        images.append(raw)
        copied = k
    if not images:
        return body, images
    out += view[copied:]
    return bytes(out), images


@dataclass
class _Active:
    prepared: object
    future: asyncio.Future
    collected: list[int] = field(default_factory=list)
    lp: Optional[list] = None            # per-token logprobs when requested
    start: float = field(default_factory=time.time)
    stream: Optional[asyncio.Queue] = None   # token-delta queue when streaming
    emitted_text: str = ""


class InferenceServer:
    def __init__(self, engine: Engine, model_name: str = "karanta-ocr"):
        self.engine = engine
        self.model_name = model_name
        self.queue: asyncio.Queue = asyncio.Queue()
        self.active: dict[int, _Active] = {}
        # requests pulled off the queue with host prep already running in a
        # thread: (request, future, stream_q, prepare-task). Bounded so the
        # staged device buffers (~17 MB/page) can't flood HBM.
        self._staged: list[tuple] = []
        # one wave's worth: enough to overlap the next wave's prep with the
        # current wave's decode, without staging more device buffers than the
        # largest batch's HBM headroom allows (1.5x batch OOMs at B80/7B)
        b = engine.ecfg.max_batch_size
        self._prep_ahead = max(8, b)
        self._server: Optional[asyncio.AbstractServer] = None
        self._engine_task: Optional[asyncio.Task] = None
        self.port: Optional[int] = None
        self.requests_served = 0
        self.completion_tokens_served = 0
        # per-op host accounting of the serving path (seconds, cumulative);
        # exposed under /metrics "prof" — the measured answer to "where does
        # the HTTP surface spend the 1-core host" (VERDICT r2 #2)
        self._prof: defaultdict = defaultdict(float)

    # ------------------------------------------------------------------
    # engine loop
    # ------------------------------------------------------------------

    async def _engine_loop(self):
        # `inflight` is the collector of a decode chunk dispatched before the
        # previous chunk's tokens were read (engine.generate's lookahead).
        # Admission is gated while a chunk is inflight — a prefill insert
        # must not race a chunk still writing the cache.
        inflight = None
        while True:
            admitted = False
            if inflight is None:
                admitted = await self._admit()
            else:
                # keep the next wave's host prep running under the inflight
                # chunk even though slot admission must wait for it
                self._top_up_staging()
            if self.active:
                if self.engine._spec_ok():
                    if inflight is not None:
                        # slot mix changed under the inflight chunk: drain it
                        # through the normal path before switching to spec
                        toks = await asyncio.to_thread(inflight)
                        inflight = None
                        self._distribute_lists({
                            slot: [int(t) for t in toks[:, slot]]
                            for slot in self.active})
                        continue
                    toks, counts = await asyncio.to_thread(
                        self.engine.decode_chunk_spec)
                    self._distribute_lists(self.engine.spec_emissions(
                        toks, counts,
                        {slot: st.prepared.max_tokens - len(st.collected)
                         for slot, st in self.active.items()}))
                else:
                    steps = self.engine.ecfg.decode_chunk
                    collect = (inflight if inflight is not None else
                               await asyncio.to_thread(
                                   self.engine.decode_chunk_async))
                    inflight = None
                    # Dispatch the NEXT chunk before blocking on this one
                    # when no slot can finish inside it (so another chunk is
                    # needed regardless), every slot is occupied (admission
                    # couldn't insert anyway), and the KV bucket has
                    # headroom: the readback + host turnaround then hides
                    # behind device execution.
                    min_remaining = min(
                        (st.prepared.max_tokens - len(st.collected)
                         for st in self.active.values()), default=0)
                    if (min_remaining > steps
                            and not any(self.engine.slot_free)
                            and self.engine.decode_headroom(steps)):
                        inflight = await asyncio.to_thread(
                            self.engine.decode_chunk_async)
                    t0 = time.perf_counter()
                    toks = await asyncio.to_thread(collect)
                    t1 = time.perf_counter()
                    self._distribute_lists({
                        slot: [int(t) for t in toks[:, slot]]
                        for slot in self.active})
                    self._prof["decode_collect_s"] += t1 - t0
                    self._prof["distribute_s"] += time.perf_counter() - t1
            else:
                if inflight is not None:
                    # every slot finished via eos under the inflight chunk:
                    # drain and discard before admitting again
                    await asyncio.to_thread(inflight)
                    inflight = None
                elif not admitted:
                    await asyncio.sleep(0.002)

    def _top_up_staging(self):
        """Pull queued requests into the staging window and start their host
        prep (image decode, layout planning, device staging) in threads NOW —
        the engine loop calls this at every chunk boundary, so the next
        wave's prep overlaps the current wave's decode instead of running
        serially at the wave boundary while the device idles."""
        headroom = getattr(self.engine, "staging_headroom", None)
        while len(self._staged) < self._prep_ahead and not self.queue.empty():
            if headroom is not None:
                # live HBM gate: staged buffers already materialized show up
                # in bytes_in_use; count only preps still in flight on top
                pending = sum(1 for *_r, p in self._staged if not p.done())
                if not headroom(pending):
                    break
            request, future, stream_q = self.queue.get_nowait()
            if future.cancelled():
                continue
            prep = asyncio.ensure_future(
                asyncio.to_thread(self.engine.prepare, request))
            self._staged.append((request, future, stream_q, prep))

    async def _admit(self) -> bool:
        from karanta_tpu.inference.engine import GuidedRegexBusy

        self._top_up_staging()
        # take up to one staged request per free slot, holding back guided
        # requests whose regex conflicts with live guided slots (never
        # silently drop the constraint — they stay staged until it drains)
        batch: list[tuple] = []
        held: list[tuple] = []
        free = sum(self.engine.slot_free)
        for item in self._staged:
            request = item[0]
            if (len(batch) < free
                    and not (request.guided_regex
                             and not self.engine.guided_available(
                                 request.guided_regex))):
                batch.append(item)
            else:
                held.append(item)
        self._staged = held
        if not batch:
            return False

        prepared_list = await asyncio.gather(
            *[prep for _, _, _, prep in batch], return_exceptions=True)

        # dispatch every page's prefill+insert WITHOUT syncing between pages
        # (the greedy unguided path is ONE fused executable per page), then
        # read the first tokens back in a single wave — the per-page
        # dispatch->sync round trip costs ~78 ms over remote-TPU tunnels
        wave: list[tuple] = []
        for (request, future, stream_q, prep), prepared in zip(batch,
                                                               prepared_list):
            if isinstance(prepared, BaseException):
                logger.error("failed to prepare request: %r", prepared)
                if not future.done():
                    future.set_exception(prepared)
                continue
            prepared.max_tokens = min(
                prepared.max_tokens,
                max(1, self.engine.ecfg.max_seq_len - len(prepared.ids) - 1))
            try:
                slot = self.engine.slot_free.index(True)
                t0 = time.perf_counter()
                first = await asyncio.to_thread(
                    self.engine.prefill_insert, slot, prepared)
                self._prof["prefill_dispatch_s"] += time.perf_counter() - t0
                wave.append((slot, prepared, future, stream_q, first))
            except GuidedRegexBusy:
                # the regex table filled between the availability check and
                # the bind: hold the request (prep already done) until the
                # conflicting automaton drains
                self._staged.append((request, future, stream_q, prep))
            except Exception as exc:
                logger.exception("failed to admit request")
                if not future.done():
                    future.set_exception(exc)

        admitted = False
        for slot, prepared, future, stream_q, first in wave:
            state = _Active(prepared=prepared, future=future, stream=stream_q)
            if prepared.logprobs:
                state.lp = [self.engine._first_logprob.pop(
                    prepared.request_id, None)]
            first_host = int(first)  # one wave of syncs, not one per page
            state.collected.append(first_host)
            if (first_host == self.engine.tok.eos_token_id
                    or prepared.max_tokens <= 1):
                reason = ("stop" if first_host == self.engine.tok.eos_token_id
                          else "length")
                self._finish(slot, state, reason)
            else:
                self.active[slot] = state
            admitted = True
        return admitted

    def _distribute_lists(self, emitted: dict):
        lp_data = getattr(self.engine, "_last_logprobs", None)
        for slot in list(self.active):
            state = self.active[slot]
            reason = None
            for j, token in enumerate(emitted[slot]):
                state.collected.append(token)
                if state.lp is not None and lp_data is not None:
                    chosen, tv, ti = lp_data
                    k = state.prepared.top_logprobs
                    state.lp.append((float(chosen[j, slot]),
                                     list(zip(ti[j, slot, :k].tolist(),
                                              tv[j, slot, :k].tolist()))))
                if token == self.engine.tok.eos_token_id:
                    reason = "stop"
                    break
                if len(state.collected) >= state.prepared.max_tokens:
                    reason = "length"
                    break
            if state.stream is not None:
                self._emit_delta(state)
            if reason:
                self._finish(slot, state, reason)
                del self.active[slot]

    def _emit_delta(self, state: _Active):
        out_ids = [t for t in state.collected
                   if t != self.engine.tok.eos_token_id]
        text = self.engine.tok.decode(out_ids)
        delta = text[len(state.emitted_text):]
        if delta:
            state.emitted_text = text
            state.stream.put_nowait(delta)

    def _finish(self, slot: int, state: _Active, reason: str):
        self.engine.free_slot(slot)
        self.requests_served += 1
        self.completion_tokens_served += len(state.collected)
        if state.stream is not None:
            self._emit_delta(state)
            state.stream.put_nowait({"finish_reason": reason})
        if state.future.done():
            return
        out_ids = [t for t in state.collected
                   if t != self.engine.tok.eos_token_id]
        t0 = time.perf_counter()
        text = self.engine.tok.decode(out_ids)
        self._prof["detokenize_s"] += time.perf_counter() - t0
        result = {
            "text": text,
            "finish_reason": reason,
            "prompt_tokens": int(len(state.prepared.ids)),
            "completion_tokens": len(state.collected),
        }
        if state.lp is not None:
            lps = [x for t, x in zip(state.collected, state.lp)
                   if t != self.engine.tok.eos_token_id][: len(out_ids)]
            result["logprobs"] = self._format_logprobs(out_ids, lps)
        state.future.set_result(result)

    def _format_logprobs(self, token_ids, lps):
        """OpenAI chat logprobs block: one entry per completion token."""
        content = []
        for tid, entry in zip(token_ids, lps):
            tok_str = self.engine.tok.decode([tid])
            if entry is None:
                content.append({"token": tok_str, "logprob": None,
                                "top_logprobs": []})
                continue
            chosen, top = entry
            content.append({
                "token": tok_str,
                "logprob": chosen,
                "top_logprobs": [
                    {"token": self.engine.tok.decode([int(i)]),
                     "logprob": float(v)} for i, v in top],
            })
        return {"content": content}

    # ------------------------------------------------------------------
    # HTTP
    # ------------------------------------------------------------------

    async def start(self, host: str = "0.0.0.0", port: int = 30024) -> int:
        self._engine_task = asyncio.create_task(self._engine_loop())
        self._server = await asyncio.start_server(self._handle, host, port)
        self.port = self._server.sockets[0].getsockname()[1]
        logger.info("karanta-tpu inference server on :%d (model=%s)",
                    self.port, self.model_name)
        return self.port

    async def stop(self):
        if self._engine_task:
            self._engine_task.cancel()
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    async def serve_forever(self):
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter):
        try:
            request_line = await reader.readline()
            if not request_line:
                return
            try:
                method, path, _ = request_line.decode().split(" ", 2)
            except ValueError:
                await self._respond(writer, 400, {"error": "bad request line"})
                return
            content_length = 0
            t0 = time.perf_counter()
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                name, _, value = line.decode("latin-1").partition(":")
                if name.strip().lower() == "content-length":
                    content_length = int(value.strip())
            t1 = time.perf_counter()
            body = (await reader.readexactly(content_length)
                    if content_length else b"")
            self._prof["header_read_s"] += t1 - t0
            self._prof["body_read_s"] += time.perf_counter() - t1

            if method == "GET" and path in ("/health", "/health/"):
                await self._respond(writer, 200, {"status": "ok"})
            elif method == "GET" and path.rstrip("/").endswith("/models"):
                await self._respond(writer, 200, {
                    "object": "list",
                    "data": [{"id": self.model_name, "object": "model",
                              "owned_by": "karanta-tpu"}],
                })
            elif method == "GET" and path == "/metrics":
                payload = {
                    "running": len(self.active),
                    "waiting": self.queue.qsize() + len(self._staged),
                    # decode-slot capacity: lets admission control fast-ramp
                    # while the engine is starved instead of pacing releases
                    # on the timer (runner.admission_controller)
                    "slots": self.engine.ecfg.max_batch_size,
                    "requests_served": self.requests_served,
                }
                if getattr(self.engine, "spec_passes", 0):
                    # speculative acceptance: tokens emitted per verify pass
                    payload["spec_passes"] = self.engine.spec_passes
                    payload["spec_tokens"] = self.engine.spec_tokens
                    payload["spec_tokens_per_pass"] = round(
                        self.engine.spec_tokens
                        / max(1, self.engine.spec_passes), 3)
                if self._prof:
                    payload["prof"] = {k: round(v, 4)
                                       for k, v in self._prof.items()}
                await self._respond(writer, 200, payload)
            elif method == "POST" and path.rstrip("/").endswith("/chat/completions"):
                await self._chat_completions(writer, body)
            else:
                await self._respond(writer, 404, {"error": f"no route {path}"})
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except Exception:
            logger.exception("request handling failed")
            try:
                await self._respond(writer, 500, {"error": "internal error"})
            except Exception:
                pass
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass

    async def _chat_completions(self, writer, body: bytes):
        try:
            t0 = time.perf_counter()
            body, raw_images = extract_data_images(body)
            t1 = time.perf_counter()
            payload = json.loads(body)
            messages = payload["messages"]
            self._prof["extract_images_s"] += t1 - t0
            self._prof["json_parse_s"] += time.perf_counter() - t1
            self._prof["requests"] += 1
        except (json.JSONDecodeError, KeyError) as exc:
            await self._respond(writer, 400, {"error": f"bad request: {exc}"})
            return

        request = GenRequest(
            raw_images=raw_images or None,
            messages=messages,
            max_tokens=int(payload.get("max_tokens", 4000)),
            temperature=float(payload.get("temperature", 0.0)),
            top_p=float(payload.get("top_p", 1.0)),
            request_id=f"chatcmpl-{uuid.uuid4().hex[:16]}",
            guided_regex=payload.get("guided_regex"),
            logprobs=bool(payload.get("logprobs", False)),
            top_logprobs=int(payload.get("top_logprobs", 0) or 0),
            speculative=(None if payload.get("speculative") is None
                         else bool(payload["speculative"])),
            # teacher-forcing hook: honored only when the engine was built
            # with EngineConfig.teacher_force (bench/validation harnesses);
            # production servers ignore the field entirely
            forced_output=(payload.get("forced_output")
                           if self.engine.ecfg.teacher_force else None),
        )
        future: asyncio.Future = asyncio.get_running_loop().create_future()

        if payload.get("stream"):
            stream_q: asyncio.Queue = asyncio.Queue()
            await self.queue.put((request, future, stream_q))
            await self._stream_response(writer, request, payload, stream_q)
            return

        await self.queue.put((request, future, None))
        try:
            result = await future
        except Exception as exc:
            from karanta_tpu.inference.engine import ContextLengthError

            status = 400 if isinstance(exc, ContextLengthError) else 500
            await self._respond(writer, status, {"error": str(exc)})
            return

        await self._respond(writer, 200, {
            "id": request.request_id,
            "object": "chat.completion",
            "created": int(time.time()),
            "model": payload.get("model", self.model_name),
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": result["text"]},
                "finish_reason": result["finish_reason"],
                **({"logprobs": result["logprobs"]}
                   if "logprobs" in result else {}),
            }],
            "usage": {
                "prompt_tokens": result["prompt_tokens"],
                "completion_tokens": result["completion_tokens"],
                "total_tokens": result["prompt_tokens"]
                + result["completion_tokens"],
            },
        })

    async def _stream_response(self, writer, request, payload,
                               stream_q: asyncio.Queue):
        """OpenAI-style SSE: chat.completion.chunk deltas then [DONE]."""
        writer.write(
            b"HTTP/1.1 200 OK\r\nContent-Type: text/event-stream\r\n"
            b"Cache-Control: no-cache\r\nConnection: close\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n")
        await writer.drain()

        def chunk_payload(delta: dict, finish: Optional[str]) -> bytes:
            body = json.dumps({
                "id": request.request_id,
                "object": "chat.completion.chunk",
                "created": int(time.time()),
                "model": payload.get("model", self.model_name),
                "choices": [{"index": 0, "delta": delta,
                             "finish_reason": finish}],
            }).encode()
            event = b"data: " + body + b"\n\n"
            return f"{len(event):x}\r\n".encode() + event + b"\r\n"

        writer.write(chunk_payload({"role": "assistant"}, None))
        await writer.drain()
        while True:
            item = await stream_q.get()
            if isinstance(item, dict):  # finish marker
                writer.write(chunk_payload({}, item["finish_reason"]))
                done = b"data: [DONE]\n\n"
                writer.write(f"{len(done):x}\r\n".encode() + done + b"\r\n")
                writer.write(b"0\r\n\r\n")
                await writer.drain()
                return
            writer.write(chunk_payload({"content": item}, None))
            await writer.drain()

    @staticmethod
    async def _respond(writer, status: int, payload: dict):
        body = json.dumps(payload).encode()
        writer.write(
            f"HTTP/1.1 {status} {'OK' if status == 200 else 'ERR'}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n"
            .encode() + body)
        await writer.drain()


# ----------------------------------------------------------------------
# CLI
# ----------------------------------------------------------------------


def build_engine_from_args(args) -> tuple[Engine, str]:
    import jax
    import jax.numpy as jnp

    from karanta_tpu.models.qwen25_vl.config import get_config
    from karanta_tpu.models.qwen25_vl.model import init_params

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ecfg = EngineConfig(
        max_batch_size=args.max_batch_size,
        max_seq_len=args.max_model_len,
        decode_chunk=args.decode_chunk,
        dtype=dtype,
        quantize=getattr(args, "quantize", None),
        kv_quantize=getattr(args, "kv_quantize", None),
        act_quant=getattr(args, "act_quant", None),
        vision_quant=getattr(args, "vision_quant", None),
        # product defaults (matching the server CLI): prefix caching and the
        # n-gram drafter ship ON — the bench and `python -m
        # karanta_tpu.pipeline` run the same configuration
        prefix_cache=getattr(args, "prefix_cache", True),
        prefix_min_tokens=getattr(args, "prefix_min_tokens", 256),
        speculative_ngram=getattr(args, "speculative_ngram", 3),
        teacher_force=getattr(args, "teacher_force", False),
    )

    mesh = None
    tp = getattr(args, "tensor_parallel_size", 1)
    dp = getattr(args, "data_parallel_size", 1)
    if tp > 1 or dp > 1:
        from karanta_tpu.parallel.mesh import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(data=dp, fsdp=1, model=tp))

    if getattr(args, "native_checkpoint", None):
        # serve a checkpoint written by the native trainer (training/
        # checkpoint.py TrainState dirs) without an HF export round trip —
        # the reference serves fine-tunes by pointing vLLM at the exported
        # HF dir (pipeline.py:1128-1131); this is the direct path.
        import os

        import jax.numpy as jnp2
        import numpy as onp

        from karanta_tpu.training.checkpoint import (
            get_last_checkpoint, restore_params,
        )

        path = args.native_checkpoint
        last = get_last_checkpoint(path) or path
        raw, meta = restore_params(last)
        if getattr(args, "tokenizer_path", None):
            from karanta_tpu.inference.tokenizer import HFTokenizer

            tok = HFTokenizer(args.tokenizer_path)
        elif (args.preset or "tiny") not in ("tiny", "small"):
            # the byte tokenizer's 272-id vocab only matches the hermetic
            # presets; silently serving a full-vocab model with it would
            # start cleanly and emit garbage
            raise SystemExit(
                f"--native-checkpoint with preset {args.preset!r} needs "
                "--tokenizer-path (an HF tokenizer dir); the hermetic byte "
                "tokenizer only fits the 'tiny'/'small' presets")
        else:
            from karanta_tpu.inference.tokenizer import ByteTokenizer

            tok = ByteTokenizer()
        if (args.preset or "tiny") in ("tiny", "small"):
            from karanta_tpu.models.qwen25_vl.config import (small_config,
                                                             tiny_config)

            factory = (tiny_config if (args.preset or "tiny") == "tiny"
                       else small_config)
            cfg = factory(vocab_size=tok.vocab_size)
        else:
            cfg = get_config(args.preset)
        params = jax.tree.map(
            lambda a: jnp2.asarray(a, dtype if onp.issubdtype(
                onp.asarray(a).dtype, onp.floating) else None), raw)
        name = f"native-{os.path.basename(os.path.normpath(last))}"
        logger.info("serving native checkpoint %s (step %s)", last,
                    meta.get("step"))
    elif args.model_path:
        from karanta_tpu.inference.tokenizer import HFTokenizer
        from karanta_tpu.models.qwen25_vl.loading import load_hf_checkpoint

        cfg = get_config(args.preset or args.model_path)
        # quantize on transfer (leaf-by-leaf): loading bf16 then quantizing
        # in the engine would OOM a 16 GB chip on 7B checkpoints
        params = load_hf_checkpoint(args.model_path, cfg, dtype,
                                    quantize=ecfg.quantize)
        if ecfg.quantize:
            ecfg = dataclasses.replace(ecfg, quantize=None)
        tok = HFTokenizer(args.model_path)
        name = args.model_path
    else:
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        if (args.preset or "tiny") in ("tiny", "small"):
            from karanta_tpu.models.qwen25_vl.config import (small_config,
                                                             tiny_config)

            factory = (tiny_config if (args.preset or "tiny") == "tiny"
                       else small_config)
            cfg = factory(vocab_size=tok.vocab_size)
        else:
            cfg = get_config(args.preset)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype)
        name = f"random-{cfg.name}"
        logger.warning("serving RANDOM weights (%s): test mode only", name)

    return Engine(params, cfg, tok, ecfg, mesh=mesh), name


def make_arg_parser() -> argparse.ArgumentParser:
    """The server CLI. Exposed standalone so tests can pin the PRODUCT
    defaults (prefix caching + n-gram speculation ship on) to the measured
    bench configuration."""
    parser = argparse.ArgumentParser(
        prog="python -m karanta_tpu.inference.server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=30024)
    parser.add_argument("--model-path", default=None,
                        help="local HF checkpoint dir (safetensors + tokenizer)")
    parser.add_argument("--native-checkpoint", dest="native_checkpoint",
                        default=None,
                        help="serve a native-trainer checkpoint: a step_<N> "
                             "dir (training/checkpoint.py) or its parent "
                             "output_dir (latest completed step is used). "
                             "With --quantize, weights quantize on-device "
                             "AFTER the full-precision transfer — for 7B-"
                             "class checkpoints on a 16 GB chip, export to "
                             "HF format and use --model-path (quantize-on-"
                             "transfer) instead")
    parser.add_argument("--tokenizer-path", dest="tokenizer_path",
                        default=None,
                        help="HF tokenizer dir for --native-checkpoint runs "
                             "of non-tiny presets (tiny uses the hermetic "
                             "byte tokenizer)")
    parser.add_argument("--preset", default=None,
                        help="architecture preset (qwen2.5-vl-3b/7b/tiny)")
    # defaults = the measured v5e sweet spot for 1288 px pages (BENCH_NOTES):
    # size --max-model-len to your real prompt+output budget — the dense
    # decode path's cache read scales with it, and smaller buckets buy
    # more slots; buckets >= 8192 auto-switch to the paged pallas kernel
    parser.add_argument("--max-batch-size", type=int, default=32)
    parser.add_argument("--max-model-len", type=int, default=4096)
    parser.add_argument("--decode-chunk", type=int, default=64)
    parser.add_argument("--tensor-parallel-size", type=int, default=1)
    parser.add_argument("--data-parallel-size", type=int, default=1)
    parser.add_argument("--quantize", default=None, choices=["int8"])
    parser.add_argument("--kv-quantize", dest="kv_quantize", default=None,
                        choices=["int8", "int4"],
                        help="quantized KV cache (per-row scales): int8 "
                             "halves decode HBM traffic and doubles slot "
                             "capacity; int4 (nibble-packed) halves it "
                             "again — opt-in capacity mode")
    parser.add_argument("--act-quant", dest="act_quant", default=None,
                        choices=["int8"],
                        help="W8A8 prefill (per-token int8 activations on "
                             "the MXU 2x int8 path); requires --quantize "
                             "int8. Measured 188->141 ms per 7B page prefill")
    parser.add_argument("--vision-quant", dest="vision_quant", default=None,
                        choices=["int8"],
                        help="W8A8 vision tower (beyond vLLM-FP8's bf16 "
                             "tower; +4%% pages/s measured)")
    parser.add_argument("--speculative-ngram", dest="speculative_ngram",
                        type=int, default=3,
                        help="draft N tokens/step by n-gram lookup over each "
                             "slot's own history; exact for greedy requests, "
                             "sampling/guided slots fall back to per-step "
                             "decode. Default on (x1.29 measured on anchored "
                             "pages); 0 disables")
    parser.add_argument("--prefix-cache", dest="prefix_cache",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="reuse cached KV for shared prompt prefixes "
                             "(default on: OCR pages share the instruction "
                             "head, x1.19 measured; --no-prefix-cache "
                             "disables)")
    parser.add_argument("--prefix-min-tokens", dest="prefix_min_tokens",
                        type=int, default=256,
                        help="LCP gate below which prefix reuse doesn't "
                             "fire. Measured pay-off threshold: forcing "
                             "the ~226-token olmOCR head through at 192 "
                             "was a ~10%% loss (BENCH_NOTES round 5)")
    parser.add_argument("--teacher-force", dest="teacher_force",
                        action="store_true",
                        help="bench/validation hook: honor per-request "
                             "forced_output streams (full compute runs; "
                             "emitted tokens come from the request). "
                             "Never for production serving. Requires "
                             "KARANTA_BENCH=1 in the environment — a "
                             "reachable endpoint with forcing on would let "
                             "any client dictate the emitted text.")
    return parser


def main(argv: Optional[list[str]] = None):
    parser = make_arg_parser()
    args = parser.parse_args(argv)

    if getattr(args, "teacher_force", False):
        import os as _os

        if _os.environ.get("KARANTA_BENCH") != "1":
            parser.error("--teacher-force is a bench-only hook: set "
                         "KARANTA_BENCH=1 to acknowledge this server must "
                         "not be reachable by untrusted clients")

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # honor an explicit CPU request even when a sitecustomize pinned a
        # TPU platform (test harnesses spawn CPU servers)
        jax.config.update("jax_platforms", "cpu")

    from karanta_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    engine, name = build_engine_from_args(args)
    server = InferenceServer(engine, model_name=name)

    async def run():
        await server.start(args.host, args.port)
        await server.serve_forever()

    asyncio.run(run())


if __name__ == "__main__":
    main()
