"""Thin OpenAI-protocol streaming chat client (CLI layer, not engine).

Closes the reference's entry point C (reference chat_llm.py:54-164):
there the assembled RAG prompt is sent to an OpenAI-compatible server
(LM Studio locally, or api.openai.com) and the completion streams back
token-by-token. The engine API deliberately stops at
``VectorDB.rag_prompt`` (SURVEY §2.5 scopes LLM dispatch out of the
query engine); this module sits ABOVE the engine, next to the CLI, and
speaks the protocol with stdlib ``http.client`` only — no SDK, no
third-party dependency, nothing Spark-side.

Protocol notes (public OpenAI API shape):
- POST {base_url}/chat/completions with ``stream: true``
- response is SSE: ``data: {json}\\n\\n`` frames, terminated by
  ``data: [DONE]``
- each frame carries ``choices[0].delta.content`` (possibly absent
  for role-only frames)
- LM-Studio-style local servers emit a leading space on the first
  token; the reference strips it (chat_llm.py ``should_strip_leading_
  space``), mirrored here via ``strip_leading_space``.
"""

from __future__ import annotations

import json
import ssl
from dataclasses import dataclass
from http.client import HTTPConnection, HTTPSConnection
from typing import Iterator
from urllib.parse import urlparse

#: The reference's default system message role for RAG answering.
DEFAULT_SYSTEM_MESSAGE = (
    "You are a helpful person who clearly and directly answers questions "
    "in a succinct fashion based on contexts provided to you."
)


@dataclass(frozen=True)
class ChatConfig:
    """Connection settings. ``base_url`` must include the API root
    (e.g. ``http://localhost:1234/v1``); ``api_key`` is sent as a
    Bearer token (LM-Studio-style servers accept any value)."""

    base_url: str
    model: str = "local-model"
    api_key: str = "not-needed"
    system_message: str = DEFAULT_SYSTEM_MESSAGE
    strip_leading_space: bool = True
    timeout_s: float = 120.0


def _connect(url) -> HTTPConnection:
    if url.scheme == "https":
        return HTTPSConnection(
            url.hostname, url.port or 443, context=ssl.create_default_context()
        )
    return HTTPConnection(url.hostname, url.port or 80)


def stream_chat(prompt: str, config: ChatConfig) -> Iterator[str]:
    """Yield completion text deltas for ``prompt`` as they arrive.

    Raises ``RuntimeError`` on a non-200 response (with the body, so
    auth/model errors surface verbatim)."""
    url = urlparse(config.base_url)
    conn = _connect(url)
    conn.timeout = config.timeout_s
    body = json.dumps(
        {
            "model": config.model,
            "messages": [
                {"role": "system", "content": config.system_message},
                {"role": "user", "content": prompt},
            ],
            "stream": True,
        }
    )
    path = url.path.rstrip("/") + "/chat/completions"
    try:
        conn.request(
            "POST",
            path,
            body=body,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {config.api_key}",
                "Accept": "text/event-stream",
            },
        )
        resp = conn.getresponse()
        if resp.status != 200:
            raise RuntimeError(
                f"chat server returned {resp.status}: "
                f"{resp.read(4096).decode('utf-8', 'replace')}"
            )
        first = True
        for raw in resp:
            line = raw.strip()
            if not line.startswith(b"data:"):
                continue
            payload = line[5:].strip()
            if payload == b"[DONE]":
                break
            try:
                frame = json.loads(payload)
            except json.JSONDecodeError:
                continue  # partial/keep-alive frame
            choices = frame.get("choices") or []
            delta = (choices[0].get("delta") or {}) if choices else {}
            content = delta.get("content")
            if not content:
                continue
            if first and config.strip_leading_space:
                content = content.lstrip(" ")
                if not content:
                    continue
            first = False
            yield content
    finally:
        conn.close()


def chat(prompt: str, config: ChatConfig) -> str:
    """Blocking variant: the full completion as one string."""
    return "".join(stream_chat(prompt, config))
