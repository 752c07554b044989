"""OpenAI-protocol streaming chat client (entry point C; no Spark).

A real HTTP server runs in-thread and speaks SSE, so the stdlib
client is exercised over an actual socket — request shape, Bearer
auth header, frame parsing, [DONE] termination, error surfacing.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vectordb_light_spark.chat import ChatConfig, chat, stream_chat


class _MockChatHandler(BaseHTTPRequestHandler):
    tokens = [" Hello", ",", " world", "!"]
    requests_seen: list[dict] = []
    fail_status: int | None = None

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests_seen.append(
            {"path": self.path, "auth": self.headers.get("Authorization"), "body": body}
        )
        if type(self).fail_status:
            self.send_response(type(self).fail_status)
            self.end_headers()
            self.wfile.write(b'{"error": "model not found"}')
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        # role-only frame first (no content), like real servers
        frames = [{"choices": [{"delta": {"role": "assistant"}}]}] + [
            {"choices": [{"delta": {"content": t}}]} for t in type(self).tokens
        ]
        for frame in frames:
            self.wfile.write(b"data: " + json.dumps(frame).encode() + b"\n\n")
        self.wfile.write(b"data: [DONE]\n\n")

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def mock_server():
    _MockChatHandler.requests_seen = []
    _MockChatHandler.fail_status = None
    server = HTTPServer(("127.0.0.1", 0), _MockChatHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}/v1"
    server.shutdown()


def test_stream_yields_deltas_and_strips_leading_space(mock_server):
    out = list(stream_chat("question", ChatConfig(base_url=mock_server)))
    assert out == ["Hello", ",", " world", "!"]


def test_chat_joins_stream(mock_server):
    assert chat("question", ChatConfig(base_url=mock_server)) == "Hello, world!"


def test_leading_space_kept_when_disabled(mock_server):
    out = list(
        stream_chat(
            "q", ChatConfig(base_url=mock_server, strip_leading_space=False)
        )
    )
    assert out[0] == " Hello"


def test_request_shape(mock_server):
    chat("the prompt", ChatConfig(base_url=mock_server, model="m1", api_key="k1"))
    req = _MockChatHandler.requests_seen[-1]
    assert req["path"] == "/v1/chat/completions"
    assert req["auth"] == "Bearer k1"
    assert req["body"]["model"] == "m1"
    assert req["body"]["stream"] is True
    roles = [m["role"] for m in req["body"]["messages"]]
    assert roles == ["system", "user"]
    assert req["body"]["messages"][1]["content"] == "the prompt"


def test_http_error_raises_with_body(mock_server):
    _MockChatHandler.fail_status = 404
    with pytest.raises(RuntimeError, match="404.*model not found"):
        chat("q", ChatConfig(base_url=mock_server))
