"""Deterministic local annotation client.

The reference POSTs each file's lines to a remote De-bias API
(reference call-debias.py:41-51) and trusts the response.  A remote,
nondeterministic API can never be a test dependency (SURVEY §5), so the
default client is a pure-function lexicon matcher with the exact response
shape the reference consumes (call-debias.py:56,59,92,98-102):

    {results: [{literal, language, tags: [{literal, issue, source}]}]}

The HTTP client is pluggable behind the same ``__call__`` interface —
swap in a requests-based client for the real API without touching the
Spark plan (see annotator.AnnotateConfig.client_factory).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# term -> (issue, source); per-language overlays merge over "default".
# Terms are matched case-insensitively on whitespace-token boundaries, first
# occurrence per term per line (mirrors a vocabulary-lookup annotation API).
_DEFAULT_TERMS: dict[str, tuple[str, str]] = {
    "slow": ("performance stereotype", "perf-vocab"),
    "small": ("diminutive framing", "size-vocab"),
    "big": ("aggrandizing framing", "size-vocab"),
    "error": ("deficit framing", "deficit-vocab"),
    "old": ("age bias", "age-vocab"),
    "young": ("age bias", "age-vocab"),
}

DEFAULT_LEXICON: dict[str, dict[str, tuple[str, str]]] = {
    "default": _DEFAULT_TERMS,
    # language overlays (the reference keys everything by language folder)
    "en": {**_DEFAULT_TERMS, "legacy": ("age bias", "age-vocab")},
    "de": _DEFAULT_TERMS,
    "fr": _DEFAULT_TERMS,
    "es": _DEFAULT_TERMS,
    "zh": _DEFAULT_TERMS,
}


@dataclass
class LexiconClient:
    """values + language -> reference-shaped response dict.  Deterministic."""

    lexicon: dict[str, dict[str, tuple[str, str]]] = field(
        default_factory=lambda: DEFAULT_LEXICON
    )
    use_ner: bool = True  # accepted for parity with the API payload
    use_llm: bool = False  # (call-debias.py:43-48); unused by the lexicon

    def __call__(self, values: list[str], language: str) -> dict:
        terms = self.lexicon.get(language) or self.lexicon["default"]
        results = []
        for value in values:
            tags = []
            seen: set[str] = set()
            for token in value.lower().split():
                if token in terms and token not in seen:
                    seen.add(token)
                    issue, source = terms[token]
                    tags.append({"literal": token, "issue": issue, "source": source})
            results.append({"literal": value, "language": language, "tags": tags})
        return {"results": results}
