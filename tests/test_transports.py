"""Production adapters (sources/transports.py): config/URL/header/message
assembly with the HTTP layer faked — the sandbox has no network and no
requests/openai packages, which is exactly the deployment seam the lazy
imports + injectable session/client exist for."""

from __future__ import annotations

import pickle
from types import SimpleNamespace

import pytest

from clashroyale_datapipeline_agent_spark.sources.transports import (
    CLASSIFIER_MODEL,
    DEFAULT_CR_BASE_URL,
    EXPERT_MODEL,
    ClashRoyaleTransport,
    OpenAIChatClient,
    OpenAIClientFactory,
)


class FakeResponse:
    def __init__(self, status_code: int, payload=None, text: str = ""):
        self.status_code = status_code
        self._payload = payload
        self.text = text

    def json(self):
        return self._payload


class FakeSession:
    """Records every GET; serves a canned response."""

    def __init__(self, response: FakeResponse):
        self.response = response
        self.calls: list[tuple[str, dict, float]] = []

    def get(self, url, headers=None, timeout=None):
        self.calls.append((url, headers, timeout))
        return self.response


def test_cr_transport_requires_key(monkeypatch):
    monkeypatch.delenv("CR_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="CR_API_KEY"):
        ClashRoyaleTransport()


def test_cr_transport_env_config(monkeypatch):
    monkeypatch.setenv("CR_API_KEY", "env-key")
    monkeypatch.setenv("CR_API_BASE_URL", "https://proxy.example/v1/")
    t = ClashRoyaleTransport()
    assert t.api_key == "env-key"
    # trailing slash stripped so path concatenation can't double it
    assert t.base_url == "https://proxy.example/v1"
    assert t.headers() == {"Authorization": "Bearer env-key"}


def test_cr_transport_explicit_args_beat_env(monkeypatch):
    monkeypatch.setenv("CR_API_KEY", "env-key")
    t = ClashRoyaleTransport(api_key="arg-key", timeout_s=3)
    assert t.api_key == "arg-key"
    assert t.base_url == DEFAULT_CR_BASE_URL
    assert t.timeout_s == 3.0


def test_cr_transport_get_assembly():
    """URL = base + path (tag already %23-encoded by battlelog_path),
    bearer header, configured timeout, parsed JSON returned."""
    from clashroyale_datapipeline_agent_spark.sources.fetch import (
        battlelog_path,
    )

    t = ClashRoyaleTransport(api_key="k", timeout_s=7)
    fake = FakeSession(FakeResponse(200, payload={"items": [{"a": 1}]}))
    t._session = fake  # pre-injected -> the lazy requests import is skipped
    out = t(battlelog_path("abc"))
    assert out == {"items": [{"a": 1}]}
    url, headers, timeout = fake.calls[0]
    assert url == f"{DEFAULT_CR_BASE_URL}/players/%23ABC/battlelog"
    assert headers == {"Authorization": "Bearer k"}
    assert timeout == 7.0


def test_cr_transport_non_200_raises_with_status_and_body():
    t = ClashRoyaleTransport(api_key="k")
    t._session = FakeSession(FakeResponse(403, text="accessDenied"))
    with pytest.raises(RuntimeError, match="403.*accessDenied"):
        t("/players/%23X/battlelog")


def test_cr_transport_pickles_without_session():
    """The live connection never crosses the wire: pickling drops the
    session (a fresh one is built lazily on the executor), config rides
    along intact."""
    t = ClashRoyaleTransport(api_key="k", base_url="https://b.example/v1")
    t._session = FakeSession(FakeResponse(200, payload=[]))
    t2 = pickle.loads(pickle.dumps(t))
    assert t2._session is None
    assert (t2.api_key, t2.base_url, t2.timeout_s) == (
        "k",
        "https://b.example/v1",
        10.0,
    )


class FakeOpenAI:
    """Records chat.completions.create kwargs; returns a canned choice."""

    def __init__(self, content: str = "ok"):
        self.kwargs = None

        def create(**kw):
            self.kwargs = kw
            msg = SimpleNamespace(content=content)
            return SimpleNamespace(choices=[SimpleNamespace(message=msg)])

        self.chat = SimpleNamespace(
            completions=SimpleNamespace(create=create)
        )


def test_openai_client_message_assembly():
    c = OpenAIChatClient(
        CLASSIFIER_MODEL, system_prompt="be terse", max_tokens=123
    )
    fake = FakeOpenAI(content="routed")
    c._client = fake  # pre-injected -> the lazy openai import is skipped
    assert c("what deck?") == "routed"
    assert fake.kwargs == {
        "model": "gpt-4.1-nano",
        "messages": [
            {"role": "system", "content": "be terse"},
            {"role": "user", "content": "what deck?"},
        ],
        "max_tokens": 123,
    }


def test_openai_client_pickles_without_client():
    c = OpenAIChatClient(EXPERT_MODEL, system_prompt="s", api_key="sk-x")
    c._client = FakeOpenAI()
    c2 = pickle.loads(pickle.dumps(c))
    assert c2._client is None
    assert (c2.model, c2.system_prompt, c2.api_key) == (
        "gpt-4.1-mini",
        "s",
        "sk-x",
    )


def test_openai_factory_is_make_client_shaped():
    """The factory itself pickles (ships to executor tasks) and each
    call yields a FRESH configured client — the once-per-task contract
    of classify_questions' make_client."""
    f = pickle.loads(
        pickle.dumps(
            OpenAIClientFactory(
                CLASSIFIER_MODEL, system_prompt="sys", max_tokens=50
            )
        )
    )
    c1, c2 = f(), f()
    assert c1 is not c2
    assert c1.model == c2.model == CLASSIFIER_MODEL
    assert c1.system_prompt == "sys" and c1.max_tokens == 50
    assert c1._client is None


def test_openai_factory_drives_classify_questions(spark):
    """End-to-end through the real mapInPandas operator: the factory is
    make_client-compatible (the network layer enters through a fake
    client injected after construction). Everything the task pickles is
    defined LOCALLY so cloudpickle ships it by value — the test module
    is not importable on executors."""

    def _fake_openai():
        content = '{"category": "meta", "data_needs": ["meta_decks"]}'

        def create(**kw):
            msg = SimpleNamespace(content=content)
            return SimpleNamespace(choices=[SimpleNamespace(message=msg)])

        return SimpleNamespace(
            chat=SimpleNamespace(completions=SimpleNamespace(create=create))
        )

    inner = OpenAIClientFactory(CLASSIFIER_MODEL)

    def offline_factory():
        c = inner()
        c._client = _fake_openai()
        return c

    from clashroyale_datapipeline_agent_spark.operators.llm_batch import (
        classify_questions,
    )

    qs = spark.createDataFrame(
        [(1, "best decks?")], "question_id bigint, question string"
    )
    row = classify_questions(qs, offline_factory).collect()[0]
    assert row["category"] == "meta"
    assert row["llm_error"] is None
