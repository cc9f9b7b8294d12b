"""HTTP annotation client — the reference's remote De-bias API call
(call-debias.py:41-51) behind the same ``__call__(values, language)``
interface as the lexicon client, so the Spark plan is identical either way.

Never a test dependency (SURVEY §5): the deterministic lexicon client is
the default; this client is the integration-only code path.  Transient
failures raise and are retried by the annotator's in-UDF retry loop (F2);
the reference's exponential backoff lives there, not here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# The reference ships its endpoint with a leading space (call-debias.py:38,
# a latent bug documented in SURVEY); ours is a required constructor arg.
DEFAULT_TIMEOUT_S = 30.0


@dataclass
class HttpDebiasClient:
    """POSTs {language, useNER, useLLM, values} and returns the parsed
    response document {results: [{literal, language, tags: [...]}]}.

    Constructed per executor task via AnnotateConfig.client_factory (a
    lambda: HttpDebiasClient(url=...)), so the underlying TCP session is
    created worker-side and never pickled.
    """

    url: str
    use_ner: bool = True
    use_llm: bool = False
    timeout_s: float = DEFAULT_TIMEOUT_S
    _session: object = field(default=None, repr=False, compare=False)

    def _ensure_session(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def __call__(self, values: list[str], language: str) -> dict:
        session = self._ensure_session()
        resp = session.post(
            self.url.strip(),  # tolerate the reference's padded-URL configs
            json={
                "language": language,
                "useNER": self.use_ner,
                "useLLM": self.use_llm,
                "values": values,
            },
            timeout=self.timeout_s,
        )
        resp.raise_for_status()
        doc = resp.json()
        if not isinstance(doc, dict) or "results" not in doc:
            raise ValueError(f"malformed annotation response: {str(doc)[:200]}")
        return doc
