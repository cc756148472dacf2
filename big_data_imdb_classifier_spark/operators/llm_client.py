"""Live LLM batch inference client (S9 — the non-mock path).

The reference does real batched genre inference against a local Ollama
server: driver-side batch loop, one ``client.generate`` call per movie,
vocab validation of the response, and a hard fallback to ``'unknown'``
on any error (reference movie_pipeline/llm_predictor.py:104-137 batch
loop + per-row calls, :169-195 parse/validate).

Here the same semantics are packaged as a pluggable ``BatchFn`` for
``enrich_with_cache``: the returned closure executes INSIDE
``mapInPandas`` on executors, so inference parallelism scales with
partitions instead of serializing on the driver, and the cache-first
anti-join upstream guarantees only uncached keys ever reach the server.

Transport is import-guarded: the ``ollama`` client package is used when
installed; otherwise the closure speaks Ollama's public REST API
directly (``POST /api/generate`` with ``{"model", "prompt", "stream":
false}`` → ``{"response": ...}``) via stdlib ``urllib`` — no optional
dependency required. Errors per row degrade to the fallback value,
never fail the job (a 100 TB enrichment must survive a flaky endpoint).
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd

# Reference vocabulary, replicated verbatim for parity
# (movie_pipeline/llm_predictor.py:33-38).
IMDB_GENRES = [
    "Action", "Adventure", "Animation", "Biography", "Comedy",
    "Crime", "Documentary", "Drama", "Family", "Fantasy",
    "History", "Horror", "Music", "Mystery", "Romance",
    "Sci-Fi", "Thriller", "War",
]

FALLBACK = "unknown"


def validate_response(raw: str | None, vocab: list[str]) -> str:
    """Vocab-validate a raw model response (reference
    llm_predictor.py:169-195): strip whitespace/quotes, case-insensitive
    match against the vocabulary (returning the vocab's casing), else
    the ``'unknown'`` fallback."""
    if raw is None:
        return FALLBACK
    cleaned = raw.strip().strip("\"'")
    lowered = cleaned.lower()
    for valid in vocab:
        if valid.lower() == lowered:
            return valid
    return FALLBACK


def _generate_via_http(host: str, model: str, prompt: str, timeout: float) -> str:
    """One Ollama ``/api/generate`` call via stdlib urllib (the REST
    twin of ``ollama.Client.generate(..., stream=False)``)."""
    import urllib.request

    req = urllib.request.Request(
        host.rstrip("/") + "/api/generate",
        data=json.dumps(
            {"model": model, "prompt": prompt, "stream": False}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode())["response"]


def make_ollama_batch_fn(
    host: str = "http://localhost:11434",
    model: str = "gemma3:4b",
    vocab: list[str] | None = None,
    prompt_fn: Callable[[str, str], str] | None = None,
    timeout: float = 60.0,
    use_client_lib: bool | None = None,
):
    """Build a ``BatchFn`` (pd.DataFrame → pd.Series) doing live Ollama
    inference, for ``enrich_with_cache(batch_fn=...)``.

    ``prompt_fn(key, text) -> str`` templates the prompt (defaults to
    ``enrichment.build_prompt``); every response is vocab-validated and
    any transport/parse error yields the fallback — matching the
    reference's per-row try/except (llm_predictor.py:120-137). The
    closure captures only plain strings/callables, so it serializes
    cleanly to executors; each Arrow batch plays the role of the
    reference's ``batch_size`` slice, but runs in parallel across
    partitions instead of a driver loop.

    ``use_client_lib``: force (True) or forbid (False) the ``ollama``
    package; default auto-detects at call time on the executor.
    """
    vocab = vocab if vocab is not None else list(IMDB_GENRES)

    def batch_fn(pdf: pd.DataFrame) -> pd.Series:
        if prompt_fn is None:
            from .enrichment import build_prompt as _prompt
        else:
            _prompt = prompt_fn

        client = None
        want_lib = use_client_lib
        if want_lib is None or want_lib:
            try:
                import ollama  # type: ignore

                # same deadline as the urllib path — a stalled endpoint
                # must not hang executor tasks forever
                client = ollama.Client(host=host, timeout=timeout)
            except ImportError:
                if want_lib:
                    raise
                client = None

        out: list[str] = []
        for key, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
            prompt = _prompt(str(key), str(text))
            try:
                if client is not None:
                    raw = client.generate(
                        model=model, prompt=prompt, stream=False
                    )["response"]
                else:
                    raw = _generate_via_http(host, model, prompt, timeout)
                out.append(validate_response(raw, vocab))
            except Exception:
                # per-row degradation, never a job failure
                # (reference llm_predictor.py:133-137)
                out.append(FALLBACK)
        return pd.Series(out)

    return batch_fn
