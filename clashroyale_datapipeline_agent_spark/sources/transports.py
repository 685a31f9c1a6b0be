"""Production network adapters for the two injected boundaries.

Everything else in the engine takes callables — ``fetch_battlelogs``
wants ``transport(path) -> parsed JSON`` and the LLM operators want
``make_client() -> (prompt -> raw text)`` — so offline tests inject
fakes. This module ships the two REAL implementations a deployment
needs, with semantics taken from the reference:

- :class:`ClashRoyaleTransport` — requests-backed CR API GET
  (``src/api/cr_client.py:8-46``: bearer token from ``CR_API_KEY``,
  base URL ``https://api.clashroyale.com/v1``, 10 s timeout, non-200
  raises ``RuntimeError`` with status + body).
- :class:`OpenAIChatClient` / :class:`OpenAIClientFactory` — OpenAI
  chat-completion callable (``src/api/llm_client.py:16-49``: lazy
  client, ``OPENAI_API_KEY`` read by the SDK from env, system+user
  message pair, ``max_tokens`` cap). Model-name defaults mirror
  ``src/workflows/phase2_constants.py:8-11``.

Sandbox rules shape the design:

- ``requests`` / ``openai`` are imported lazily INSIDE the first call,
  never at module import — this module always imports cleanly where
  neither package exists, and unit tests exercise URL/header/message
  assembly by pre-injecting a fake session/client.
- Instances hold CONFIG only; the live session/client is created on
  first call and dropped on pickle, so the same object works on the
  driver and inside ``mapInPandas`` tasks (each executor task lazily
  builds its own connection — connection setup cost is per-task,
  request cost per row, exactly the ``make_client`` contract).

Wiring (see README "Production adapters"):

    from clashroyale_datapipeline_agent_spark.sources.transports import (
        ClashRoyaleTransport, OpenAIClientFactory, CLASSIFIER_MODEL)
    fetched = fetch_battlelogs(tags_df, transport=ClashRoyaleTransport())
    routed = classify_questions(qs, OpenAIClientFactory(CLASSIFIER_MODEL,
                                                        system_prompt=...))
"""

from __future__ import annotations

import os
from typing import Any

#: CR API root (``cr_client.py:12``); override via ``CR_API_BASE_URL``.
DEFAULT_CR_BASE_URL = "https://api.clashroyale.com/v1"

#: Reference model choices (``phase2_constants.py:8-11``): a cheap
#: classifier for routing, a stronger model for coaching.
CLASSIFIER_MODEL = "gpt-4.1-nano"
EXPERT_MODEL = "gpt-4.1-mini"


class ClashRoyaleTransport:
    """Requests-backed ``Transport`` for :func:`sources.fetch.fetch_battlelogs`.

    ``transport(path)`` GETs ``{base_url}{path}`` with a bearer header
    and returns the parsed JSON body; any non-200 status raises
    ``RuntimeError`` carrying status and body (``cr_client.py:40-44``) —
    the fetch operator records that per tag without aborting the batch.

    Config resolution order: explicit argument, then environment
    (``CR_API_KEY`` / ``CR_API_BASE_URL``), then the public default URL.
    A missing key fails HERE, on the driver at construction time — not
    as N_tags opaque executor-side errors later.
    """

    def __init__(
        self,
        api_key: str | None = None,
        base_url: str | None = None,
        timeout_s: float = 10.0,
    ) -> None:
        self.api_key = api_key if api_key is not None else os.environ.get("CR_API_KEY")
        if not self.api_key:
            raise RuntimeError(
                "CR_API_KEY is not set — pass api_key=... or export it "
                "in the environment"
            )
        self.base_url = (
            base_url
            or os.environ.get("CR_API_BASE_URL")
            or DEFAULT_CR_BASE_URL
        ).rstrip("/")
        self.timeout_s = float(timeout_s)
        self._session: Any = None  # lazy; never pickled

    def headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"}

    def url_for(self, path: str) -> str:
        """Absolute URL for an API path (paths start with ``/``)."""
        return f"{self.base_url}{path}"

    def __call__(self, path: str) -> Any:
        if self._session is None:
            import requests  # lazy: only a real deployment needs it

            self._session = requests.Session()
        resp = self._session.get(
            self.url_for(path), headers=self.headers(), timeout=self.timeout_s
        )
        if resp.status_code != 200:
            raise RuntimeError(
                f"Clash Royale API error {resp.status_code}: {resp.text}"
            )
        return resp.json()

    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_session"] = None  # connections never cross the wire
        return state


class OpenAIChatClient:
    """Picklable ``prompt -> raw text`` callable over OpenAI chat
    completions — the product of ``make_client()`` in the LLM operators,
    with the reference's request shape (``llm_client.py:39-49``): one
    system message, one user message, ``max_tokens`` cap, first choice's
    content returned raw (parsing/fallbacks stay in the operators)."""

    def __init__(
        self,
        model: str,
        *,
        system_prompt: str = "",
        max_tokens: int = 600,
        api_key: str | None = None,
    ) -> None:
        self.model = model
        self.system_prompt = system_prompt
        self.max_tokens = int(max_tokens)
        self.api_key = api_key  # None -> SDK reads OPENAI_API_KEY from env
        self._client: Any = None  # lazy; never pickled

    def messages_for(self, prompt: str) -> list[dict[str, str]]:
        """The system+user pair the reference sends (``llm_client.py:42-45``)."""
        return [
            {"role": "system", "content": self.system_prompt},
            {"role": "user", "content": prompt},
        ]

    def __call__(self, prompt: str) -> str:
        if self._client is None:
            from openai import OpenAI  # lazy: only a real deployment needs it

            self._client = (
                OpenAI() if self.api_key is None else OpenAI(api_key=self.api_key)
            )
        resp = self._client.chat.completions.create(
            model=self.model,
            messages=self.messages_for(prompt),
            max_tokens=self.max_tokens,
        )
        return resp.choices[0].message.content

    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_client"] = None
        return state


class OpenAIClientFactory:
    """``make_client`` for :func:`operators.llm_batch.classify_questions`
    and friends: called once per executor task, returns a fresh
    :class:`OpenAIChatClient`. A plain class (not a closure) so standard
    pickling works regardless of serializer."""

    def __init__(
        self,
        model: str,
        *,
        system_prompt: str = "",
        max_tokens: int = 600,
        api_key: str | None = None,
    ) -> None:
        self.model = model
        self.system_prompt = system_prompt
        self.max_tokens = int(max_tokens)
        self.api_key = api_key

    def __call__(self) -> OpenAIChatClient:
        return OpenAIChatClient(
            self.model,
            system_prompt=self.system_prompt,
            max_tokens=self.max_tokens,
            api_key=self.api_key,
        )
