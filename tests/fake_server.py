"""Fake OpenAI-protocol server for pipeline tests (SURVEY.md §4's
mesh-free test harness): configurable per-request behavior so retry ladders,
rotation correction, and failure budgets can be exercised hermetically."""

from __future__ import annotations

import asyncio
import json
from typing import Callable, Optional


class FakeOpenAIServer:
    """Minimal HTTP/1.1 server: GET /v1/models, POST /v1/chat/completions.

    `responder(request_json, call_index) -> (status, payload_dict | bytes)`
    """

    def __init__(self, responder: Optional[Callable] = None):
        self.responder = responder or self.default_responder
        self.calls: list[dict] = []
        # full request records incl. path/query/headers (Azure URL-shape tests)
        self.raw_calls: list[dict] = []
        self._server: Optional[asyncio.AbstractServer] = None
        self.port: Optional[int] = None
        # mutable queue depths served on GET /metrics (admission-control tests)
        self.metrics = {"running": 0, "waiting": 0}

    @staticmethod
    def page_json(text: str = "Hello from fake model", **overrides) -> dict:
        page = {
            "primary_language": "en",
            "is_rotation_valid": True,
            "rotation_correction": 0,
            "is_table": False,
            "is_diagram": False,
            "natural_text": text,
        }
        page.update(overrides)
        return page

    @classmethod
    def completion(cls, content, prompt_tokens=50, completion_tokens=20,
                   finish_reason="stop") -> dict:
        if not isinstance(content, str):
            content = json.dumps(content)
        return {
            "id": "fake-1",
            "object": "chat.completion",
            "model": "fake",
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": content},
                "finish_reason": finish_reason,
            }],
            "usage": {
                "prompt_tokens": prompt_tokens,
                "completion_tokens": completion_tokens,
                "total_tokens": prompt_tokens + completion_tokens,
            },
        }

    def default_responder(self, request, call_index):
        return 200, self.completion([self.page_json()])

    async def start(self) -> int:
        self._server = await asyncio.start_server(self._handle, "127.0.0.1", 0)
        self.port = self._server.sockets[0].getsockname()[1]
        return self.port

    async def stop(self):
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/v1"

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter):
        try:
            request_line = await reader.readline()
            if not request_line:
                return
            method, raw_path, _ = request_line.decode().split(" ", 2)
            path, _, query = raw_path.partition("?")
            content_length = 0
            headers: dict[str, str] = {}
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                name, _, value = line.decode().partition(":")
                headers[name.strip().lower()] = value.strip()
                if name.strip().lower() == "content-length":
                    content_length = int(value.strip())
            body = await reader.readexactly(content_length) if content_length else b""
            self.raw_calls.append({"method": method, "path": path,
                                   "query": query, "headers": headers,
                                   "body": body})

            if method == "GET" and path.endswith("/models"):
                payload = json.dumps({"object": "list",
                                      "data": [{"id": "fake"}]}).encode()
                status = 200
            elif method == "GET" and path.endswith("/metrics"):
                payload = json.dumps(dict(self.metrics)).encode()
                status = 200
            elif method == "POST" and path.endswith("/chat/completions"):
                request = json.loads(body)
                idx = len(self.calls)
                self.calls.append(request)
                status, payload = self.responder(request, idx)
                if isinstance(payload, dict):
                    payload = json.dumps(payload).encode()
            else:
                status, payload = 404, b"{}"

            writer.write(
                f"HTTP/1.1 {status} X\r\nContent-Type: application/json\r\n"
                f"Content-Length: {len(payload)}\r\nConnection: close\r\n\r\n"
                .encode() + payload)
            await writer.drain()
        except Exception:
            pass
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass
