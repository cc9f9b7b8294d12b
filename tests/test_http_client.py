"""HTTP client unit tests (mocked transport — the network is never a test
dependency, SURVEY §5)."""

from __future__ import annotations

import pytest

from debias_spark.annotate.http_client import HttpDebiasClient


class _FakeResponse:
    def __init__(self, doc, status=200):
        self.doc, self.status = doc, status

    def raise_for_status(self):
        if self.status >= 400:
            raise RuntimeError(f"HTTP {self.status}")

    def json(self):
        return self.doc


class _FakeSession:
    def __init__(self, doc, status=200):
        self.doc, self.status, self.calls = doc, status, []

    def post(self, url, json=None, timeout=None):
        self.calls.append({"url": url, "json": json, "timeout": timeout})
        return _FakeResponse(self.doc, self.status)


def _client(doc, status=200):
    c = HttpDebiasClient(url=" https://api.example/debias ")
    c._session = _FakeSession(doc, status)
    return c


def test_payload_contract_and_url_strip():
    doc = {"results": [{"literal": "x", "language": "en", "tags": []}]}
    c = _client(doc)
    out = c(["x"], "en")
    assert out == doc
    call = c._session.calls[0]
    # the reference's payload shape (call-debias.py:43-48)
    assert call["json"] == {
        "language": "en", "useNER": True, "useLLM": False, "values": ["x"],
    }
    # padded URL (the reference's latent leading-space bug) is tolerated
    assert call["url"] == "https://api.example/debias"


def test_http_error_raises_for_retry_loop():
    c = _client({"results": []}, status=503)
    with pytest.raises(RuntimeError, match="HTTP 503"):
        c(["x"], "en")


def test_malformed_response_raises():
    c = _client({"nope": 1})
    with pytest.raises(ValueError, match="malformed"):
        c(["x"], "en")
