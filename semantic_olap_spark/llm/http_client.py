"""Production HTTP LLM backend (OpenAI-compatible wire format).

The reference's whole backend contract is one method,
``llm.predict(prompt) -> str`` (Semantic-OLAP/Agents/Components/
Operaters.py:69,343,388,423,487) — its operators never see transport.
This module supplies the production implementation of that contract:
:class:`HttpLLM` speaks the public-standard ``/v1/chat/completions``
JSON wire format (the de-facto interface of OpenAI-compatible
inference servers: vLLM, llama.cpp server, TGI's OpenAI shim, …), so
one class covers every endpoint a semantic-OLAP deployment is likely
to run against.

Built for executor-side use (SURVEY.md §4 physical layer):

- **stdlib only** (``urllib.request``) — nothing to install on
  workers.
- **picklable** — live state (locks, rate-limiter clock) drops on
  pickle and rebuilds lazily, so a factory closing over an HttpLLM
  recipe ships to every executor and each worker process owns its
  own connections.
- **retry with exponential backoff + jitter** on 408/429/5xx and
  transport errors, honouring ``Retry-After``; other 4xx fail fast
  (a bad request never fixes itself).
- **token-bucket rate limiting** — per *client process*.  On a
  1000-executor cluster each worker self-limits to
  ``rate_limit_rps``; size it as endpoint_capacity / max_workers.
  (Global admission control belongs on the serving side; a
  distributed limiter would serialize the cluster on one lock.)
- **bounded concurrency by composition**, not built in: wrap with
  :class:`~semantic_olap_spark.llm.client.ConcurrentLLM` to fan an
  Arrow batch of prompts out over threads, and with
  :class:`~semantic_olap_spark.llm.client.CachingLLM` so repeated
  prompts inside a task hit the memo, in the documented order
  ``CachingLLM(ConcurrentLLM(HttpLLM(...)))`` —
  :func:`http_llm_factory` builds exactly that stack.

Malformed *content* (an LLM answering JSON tasks sloppily) is the
downstream concern of ``llm/repair.py``; malformed *transport* (a 200
whose body is not valid completions JSON) is retried here up to the
attempt budget — proxies and overloaded servers truncate bodies — and
then raised as :class:`LLMTransportError`.
"""

from __future__ import annotations

import json
import random
import threading
import time
import urllib.error
import urllib.request
from typing import Callable, Mapping

from semantic_olap_spark.llm.client import (
    BaseLLM,
    CachingLLM,
    ConcurrentLLM,
    LLM,
)

__all__ = [
    "HttpLLM",
    "LLMTransportError",
    "TokenBucket",
    "http_llm_factory",
]

# statuses that indicate a transient condition worth retrying
_RETRY_STATUSES = frozenset({408, 429, 500, 502, 503, 504})


class LLMTransportError(RuntimeError):
    """The endpoint could not produce a usable completion.

    Raised after the retry budget is exhausted (transient statuses,
    connection failures, malformed bodies) or immediately on a
    non-retryable 4xx.  ``status`` is the last HTTP status seen, or
    None for pure transport failures.
    """

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class TokenBucket:
    """Thread-safe token bucket: ``rate`` tokens/sec, burst ``capacity``.

    ``acquire()`` blocks the calling thread until a token is
    available.  Blocking (rather than erroring) is the right shape
    under ConcurrentLLM: the pool threads queue up and the request
    stream smooths to the configured rate instead of failing.
    """

    def __init__(self, rate: float, capacity: float | None = None):
        if rate <= 0:
            raise ValueError("rate must be > 0")
        self.rate = float(rate)
        self.capacity = float(capacity if capacity is not None else rate)
        self._tokens = self.capacity
        self._ts = time.monotonic()
        self._lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self._lock:
                now = time.monotonic()
                self._tokens = min(
                    self.capacity, self._tokens + (now - self._ts) * self.rate
                )
                self._ts = now
                if self._tokens >= 1.0:
                    self._tokens -= 1.0
                    return
                wait = (1.0 - self._tokens) / self.rate
            time.sleep(wait)

    # a bucket's live clock/lock must not ship across processes
    def __getstate__(self):
        return {"rate": self.rate, "capacity": self.capacity}

    def __setstate__(self, state):
        self.__init__(state["rate"], state["capacity"])


class HttpLLM(BaseLLM):
    """``predict(prompt) -> str`` over an OpenAI-compatible endpoint.

    Parameters
    ----------
    base_url:
        Endpoint root, e.g. ``http://localhost:8000/v1`` — the client
        POSTs to ``<base_url>/chat/completions``.
    model:
        Model name forwarded verbatim in the request body.
    api_key:
        Bearer token; omit for unauthenticated local servers.
    temperature / max_tokens / seed / extra_body:
        Standard sampling controls.  ``temperature`` defaults to 0.0:
        semantic operators are filters/classifiers whose answers feed
        deterministic set logic — sampling noise there is a
        correctness bug, not creativity.
    timeout:
        Per-request socket timeout in seconds.
    max_retries:
        Additional attempts after the first (so ``max_retries=4`` ⇒
        at most 5 requests per prompt).
    backoff_base / backoff_cap:
        Exponential backoff ``base·2^attempt`` seconds, capped, plus
        up to 25% uniform jitter (decorrelates executor retry storms).
        A server ``Retry-After`` overrides the computed delay.
    rate_limiter:
        Optional :class:`TokenBucket` shared by every thread of this
        client (ConcurrentLLM workers included).
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        temperature: float = 0.0,
        max_tokens: int = 512,
        seed: int | None = None,
        timeout: float = 60.0,
        max_retries: int = 4,
        backoff_base: float = 0.5,
        backoff_cap: float = 30.0,
        rate_limiter: TokenBucket | None = None,
        extra_headers: Mapping[str, str] | None = None,
        extra_body: Mapping[str, object] | None = None,
        system_prompt: str | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.seed = seed
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.backoff_cap = backoff_cap
        self.rate_limiter = rate_limiter
        self.extra_headers = dict(extra_headers or {})
        self.extra_body = dict(extra_body or {})
        self.system_prompt = system_prompt
        self._usage_lock = threading.Lock()
        # cumulative endpoint-reported usage — the number an operator
        # budget (SURVEY §4 cost accounting) reads after a run
        self.usage = {"prompt_tokens": 0, "completion_tokens": 0,
                      "requests": 0, "retries": 0}

    # -- pickling: locks don't cross process boundaries ---------------
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_usage_lock", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._usage_lock = threading.Lock()

    # -- wire ----------------------------------------------------------
    def _request_body(self, prompt: str) -> bytes:
        messages = []
        if self.system_prompt:
            messages.append({"role": "system", "content": self.system_prompt})
        messages.append({"role": "user", "content": prompt})
        body: dict[str, object] = {
            "model": self.model,
            "messages": messages,
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        }
        if self.seed is not None:
            body["seed"] = self.seed
        body.update(self.extra_body)
        return json.dumps(body).encode("utf-8")

    def _headers(self) -> dict[str, str]:
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        h.update(self.extra_headers)
        return h

    @staticmethod
    def _parse(raw: bytes) -> tuple[str, Mapping]:
        doc = json.loads(raw.decode("utf-8"))
        content = doc["choices"][0]["message"]["content"]
        if not isinstance(content, str):
            raise TypeError("completion content is not a string")
        return content, doc.get("usage") or {}

    def _backoff(self, attempt: int, retry_after: str | None) -> float:
        if retry_after:
            try:
                return max(0.0, float(retry_after))
            except ValueError:
                pass  # HTTP-date form: fall through to computed delay
        d = min(self.backoff_cap, self.backoff_base * (2.0 ** attempt))
        return d * (1.0 + random.uniform(0.0, 0.25))

    def predict(self, prompt: str) -> str:
        url = f"{self.base_url}/chat/completions"
        data = self._request_body(prompt)
        last_err: str = "no attempt made"
        last_status: int | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                with self._usage_lock:
                    self.usage["retries"] += 1
            if self.rate_limiter is not None:
                self.rate_limiter.acquire()
            req = urllib.request.Request(
                url, data=data, headers=self._headers(), method="POST"
            )
            retry_after = None
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    raw = r.read()
                content, usage = self._parse(raw)
            except urllib.error.HTTPError as e:
                last_status = e.code
                retry_after = e.headers.get("Retry-After")
                last_err = f"HTTP {e.code}: {e.reason}"
                if e.code not in _RETRY_STATUSES:
                    raise LLMTransportError(
                        f"non-retryable {last_err}", status=e.code
                    ) from e
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_status = None
                last_err = f"transport error: {e}"
            except (json.JSONDecodeError, KeyError, IndexError,
                    TypeError) as e:
                # 200 with an unusable body — truncating proxy or an
                # overloaded server; transient, so retry
                last_status = 200
                last_err = f"malformed completions body: {e}"
            else:
                with self._usage_lock:
                    self.usage["requests"] += 1
                    self.usage["prompt_tokens"] += int(
                        usage.get("prompt_tokens") or 0
                    )
                    self.usage["completion_tokens"] += int(
                        usage.get("completion_tokens") or 0
                    )
                return content
            if attempt < self.max_retries:
                time.sleep(self._backoff(attempt, retry_after))
        raise LLMTransportError(
            f"{url} failed after {self.max_retries + 1} attempts "
            f"(last: {last_err})",
            status=last_status,
        )


def http_llm_factory(
    base_url: str,
    model: str,
    *,
    cache: bool = True,
    concurrency: int = 8,
    rate_limit_rps: float | None = None,
    rate_limit_burst: float | None = None,
    **http_kwargs,
) -> Callable[[], LLM]:
    """Picklable factory building the production client stack.

    Returns a zero-arg callable producing
    ``CachingLLM(ConcurrentLLM(HttpLLM(...)))`` — the documented
    composition: the cache dedups repeated prompts first, the pool
    fans only misses out, the HTTP layer retries/limits each call.
    Pass the result anywhere an ``llm_factory`` is accepted; each
    executor worker process builds its own stack (its own cache, pool
    and rate bucket) on first use.

    Compose with :func:`~semantic_olap_spark.llm.client.
    wrap_cost_tracking` for accumulator-based request/backend-call
    stats, identical to the stub path.
    """

    def build() -> LLM:
        limiter = (
            TokenBucket(rate_limit_rps, rate_limit_burst)
            if rate_limit_rps
            else None
        )
        llm: LLM = HttpLLM(
            base_url, model, rate_limiter=limiter, **http_kwargs
        )
        if concurrency and concurrency > 1:
            llm = ConcurrentLLM(llm, max_workers=concurrency)
        if cache:
            llm = CachingLLM(llm)
        return llm

    return build
