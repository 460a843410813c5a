"""In-process OpenAI-compatible mock endpoint (test/dev utility).

Serves ``POST <base>/chat/completions`` answering every prompt with a
pluggable backend — by default the deterministic
:class:`~semantic_olap_spark.llm.client.StubLLM` — wrapped in the
standard completions JSON envelope.  Two jobs:

- **Backend-swap validation**: run any semantic operator with
  ``http_llm_factory(server.base_url, ...)`` and its results must be
  identical to the stub path, proving the production
  :class:`~semantic_olap_spark.llm.http_client.HttpLLM` transport
  changes nothing but the wire (the driver's ``sem_filter_http``
  contract row does exactly this under a full DuckDB oracle).
- **Fault injection**: ``server.state.faults`` is a consume-in-order
  script of 429/5xx statuses (with headers such as ``Retry-After``),
  malformed 200 bodies, and slow responses — the test bench for
  HttpLLM's retry/backoff/rate-limit machinery.

Local-mode executors reach it over loopback; threads are daemonized
so a leaked server never blocks interpreter exit.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from semantic_olap_spark.llm.client import LLM, StubLLM

__all__ = [
    "LatencyLLM",
    "MockState",
    "MockOpenAIServer",
    "start_mock_openai_server",
]


class LatencyLLM(LLM):
    """Backend wrapper injecting fixed per-call latency.

    Models a real inference endpoint whose per-prompt cost is
    network/GPU-bound (~tens of ms), unlike the ~0µs stub: the bench
    and pytest use it to prove the client stack's thread-pool fan-out
    actually pipelines calls (wall ≈ calls/concurrency × latency)
    instead of serializing them (wall ≈ calls × latency — the
    reference's per-row ``series.apply`` bottleneck,
    Operaters.py:76).  ``sleep`` releases the GIL, so concurrent
    handler threads overlap exactly like real network waits.
    """

    def __init__(self, inner: LLM, seconds: float):
        self.inner = inner
        self.seconds = float(seconds)

    def predict(self, prompt: str) -> str:
        time.sleep(self.seconds)
        return self.inner.predict(prompt)

    def predict_batch(self, batch: list[str]) -> list[str]:
        return [self.predict(p) for p in batch]


class MockState:
    """Mutable request log + fault script shared with the handler."""

    def __init__(self):
        self.lock = threading.Lock()
        # each fault: {"kind": "status", "code": int, "headers": {...}}
        #           | {"kind": "garbage", "body": bytes}
        #           | {"kind": "slow", "seconds": float}
        self.faults: list[dict] = []
        self.requests = 0
        self.last_body: dict | None = None
        self.auth_headers: list[str | None] = []
        # distinct "model" strings seen — multi-process tests encode
        # the worker pid in the model name to prove which processes
        # actually reached the endpoint
        self.models_seen: set[str] = set()


def _make_handler(backend: LLM, state: MockState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep test output quiet
            pass

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length))
            with state.lock:
                state.requests += 1
                state.last_body = body
                state.auth_headers.append(self.headers.get("Authorization"))
                state.models_seen.add(str(body.get("model", "mock")))
                fault = state.faults.pop(0) if state.faults else None
            if fault:
                kind = fault["kind"]
                if kind == "status":
                    self.send_response(fault["code"])
                    for k, v in fault.get("headers", {}).items():
                        self.send_header(k, v)
                    self.end_headers()
                    return
                if kind == "garbage":
                    raw = fault.get("body", b"not json {{{")
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(raw)))
                    self.end_headers()
                    self.wfile.write(raw)
                    return
                if kind == "slow":
                    time.sleep(fault["seconds"])
            prompt = body["messages"][-1]["content"]
            try:
                answer = backend.predict(prompt)
            except ValueError:
                answer = "NA"
            doc = {
                "id": "cmpl-mock",
                "object": "chat.completion",
                "model": body.get("model", "mock"),
                "choices": [
                    {"index": 0, "finish_reason": "stop",
                     "message": {"role": "assistant", "content": answer}}
                ],
                "usage": {
                    "prompt_tokens": len(prompt.split()),
                    "completion_tokens": len(answer.split()),
                },
            }
            raw = json.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

    return Handler


class _DeepBacklogServer(ThreadingHTTPServer):
    # socketserver's default listen backlog is 5; a concurrency-16
    # client stack (× N executor workers) opens dozens of
    # simultaneous connections, and a dropped SYN costs a 1s kernel
    # retransmit that poisons latency measurements.  Real serving
    # endpoints run deep accept queues; so does the mock.
    request_queue_size = 512
    daemon_threads = True


class MockOpenAIServer:
    def __init__(self, backend: LLM | None = None, host: str = "127.0.0.1",
                 port: int = 0):
        self.state = MockState()
        self._srv = _DeepBacklogServer(
            (host, port), _make_handler(backend or StubLLM(), self.state)
        )
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()
        self.base_url = f"http://{host}:{self._srv.server_address[1]}/v1"

    def shutdown(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()


def start_mock_openai_server(
    backend: LLM | None = None,
) -> MockOpenAIServer:
    """Start a loopback completions endpoint; stub-backed by default."""
    return MockOpenAIServer(backend)
