"""M12 (call path): distributed, rate-limited external-completion calls.

The reference drives GPT-3 with a serial driver-side loop —
``openai.Completion.create(model='text-davinci-002', temperature=0,
max_tokens=100, stop=['\\n'])`` per prompt
(``src/variable_extraction_GPT-3.py:215-233``). The Spark-first
re-expression is :func:`complete_prompts`: an iterator-form
``mapInPandas`` where each task loads a transport once, then walks its
partition's prompts through a token-bucket rate limiter with
exponential-backoff retries. The reference's serial loop is exactly the
1-partition case; ``prompts.repartition(P)`` sets the call concurrency,
and callers hold the GLOBAL budget by setting ``requests_per_sec =
global_rps / P`` (each task enforces its own bucket; Spark gives no
cross-task clock, so the per-task quota is the only shape that needs no
coordination shuffle).

Failure contract: a prompt whose attempts are exhausted yields
``status='error', completion=NULL`` — an honest row, not a fake
completion (the same policy as the solver's ``status='unverified'``).
The job never throws on transport errors, so one flaky endpoint cannot
kill a 10^12-row pipeline stage; downstream filters on ``status``.

Transports (zero-arg factories returning ``call(prompt) -> str``):
- :func:`_stub_transport_loader` (default): deterministic — parses the
  query sentence off the prompt tail and answers with the M13 stub
  grammar, so the full call path is testable offline.
- :func:`_echo_transport_loader`: md5-echo, SQL-expressible — the
  driver's DuckDB oracle verifies the whole rate-limited path
  value-for-value (contract entry ``gpt3_completions``).
- :func:`_openai_transport_loader`: the real egress (reference
  parameters), gated on the openai package + env. Never exercised in
  this container (no network); the plumbing around it is.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _parse_query_sentence(prompt: str) -> str:
    """The query sentence is the text after the LAST 'Sentence: ' up to
    its '\\nBehaviours:' suffix (prompts_from ``prompts.fewshot_prompts``)."""
    tail = prompt.rsplit("Sentence: ", 1)[-1]
    return tail.split("\nBehaviours:", 1)[0].strip()


def _stub_transport_loader():
    """Deterministic offline transport: answer with the M13 stub
    variable grammar over the parsed query sentence."""
    from ..functions import stub_models

    def call(prompt: str) -> str:
        return stub_models.extract_variables_batch([_parse_query_sentence(prompt)])[0]

    return call


def _echo_transport_loader():
    """SQL-expressible transport for the DuckDB value oracle:
    completion = md5 prefix of the prompt."""
    import hashlib

    def call(prompt: str) -> str:
        return hashlib.md5(prompt.encode("utf-8")).hexdigest()[:16]

    return call


def _openai_transport_loader():  # pragma: no cover - requires openai + network
    """Real egress, reference parameters
    (``src/variable_extraction_GPT-3.py:218-226``). Requires the openai
    package and ``$OPENAI_API_KEY``; model from
    ``$SPARK_GRAFT_OPENAI_MODEL`` (default the reference's)."""
    import os

    import openai

    model = os.environ.get("SPARK_GRAFT_OPENAI_MODEL", "text-davinci-002")

    def call(prompt: str) -> str:
        return openai.Completion.create(
            model=model, prompt=prompt, temperature=0, max_tokens=100,
            top_p=1, frequency_penalty=0, presence_penalty=0, stop=["\n"],
        )["choices"][0]["text"]

    return call


def complete_prompts(
    prompts: DataFrame,
    transport_loader=_stub_transport_loader,
    requests_per_sec: float = 2.0,
    max_retries: int = 3,
    backoff_base_sec: float = 0.5,
    prompt_col: str = "prompt",
) -> DataFrame:
    """prompts(... , prompt) -> the same rows + (completion, n_attempts,
    status). ``requests_per_sec`` is the PER-TASK token-bucket rate
    (attempts count against it); retries back off exponentially from
    ``backoff_base_sec``. ``status`` is 'ok' or 'error' (completion NULL).
    """
    out_schema = T.StructType(
        list(prompts.schema.fields)
        + [
            T.StructField("completion", T.StringType()),
            T.StructField("n_attempts", T.IntegerType()),
            T.StructField("status", T.StringType()),
        ]
    )
    min_interval = 1.0 / requests_per_sec if requests_per_sec > 0 else 0.0

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        call = transport_loader()  # once per task
        next_slot = 0.0

        def rate_limited(prompt: str) -> tuple[str | None, int, str]:
            nonlocal next_slot
            for attempt in range(1, max_retries + 1):
                now = time.monotonic()
                if now < next_slot:
                    time.sleep(next_slot - now)
                next_slot = max(now, next_slot) + min_interval
                try:
                    return call(prompt), attempt, "ok"
                except Exception:  # noqa: BLE001 - any transport failure retries
                    if attempt < max_retries:
                        time.sleep(backoff_base_sec * (2 ** (attempt - 1)))
            return None, max_retries, "error"

        for pdf in batches:
            if not len(pdf):
                continue
            results = [rate_limited(p) for p in pdf[prompt_col]]
            out = pdf.copy()
            out["completion"] = [r[0] for r in results]
            out["n_attempts"] = pd.array([r[1] for r in results], dtype="int32")
            out["status"] = [r[2] for r in results]
            yield out

    return prompts.mapInPandas(fn, out_schema)
