"""M12 call path: the distributed rate-limited completion operator
(``operators/completion.py``) — the Spark-first re-expression of the
reference's serial GPT-3 loop (``variable_extraction_GPT-3.py:215-233``).
The real egress transport needs network (absent here); every guarantee
the operator adds around it — token-bucket rate limiting, retry with
backoff, honest error rows, per-task transport load, determinism — is
tested with offline transports."""

from __future__ import annotations

from coap_rfc_knowledge_graph_spark.operators.completion import (
    _echo_transport_loader,
    _parse_query_sentence,
    complete_prompts,
)

PROMPT = (
    "Sentence: The token MUST be set to one.\nBehaviours: token @ be set to one = True;\n"
    "Sentence: The Token MUST be set to zero.\nBehaviours: "
)


def _prompts_df(spark, n, partitions=2):
    rows = [(i, PROMPT.replace("zero", f"zero {i}")) for i in range(n)]
    return spark.createDataFrame(rows, "query_id long, prompt string").repartition(partitions)


def test_parse_query_sentence():
    assert _parse_query_sentence(PROMPT) == "The Token MUST be set to zero."


def test_stub_transport_answers_m13_grammar(spark):
    out = complete_prompts(_prompts_df(spark, 4), requests_per_sec=10_000).collect()
    assert len(out) == 4
    for r in out:
        assert r.status == "ok" and r.n_attempts == 1
        assert r.completion == "token @ be set to zero %d = True;" % r.query_id


def test_rate_limit_enforced_per_task(spark, tmp_path):
    """8 prompts in ONE partition at 10 req/s: the span between the
    first and last TRANSPORT CALL must cover the 7 inter-call gaps
    (>= 0.7 s). Measured at the call sites themselves (timestamp marker
    files), not via job wall time — Spark scheduling noise on a shared
    host would swamp an end-to-end timing comparison."""
    import os

    mark_dir = str(tmp_path / "marks")

    def stamping_loader():
        import os as _os
        import time as _time
        import uuid as _uuid

        _os.makedirs(mark_dir, exist_ok=True)

        def call(prompt: str) -> str:
            with open(_os.path.join(mark_dir, _uuid.uuid4().hex), "w") as fh:
                fh.write(repr(_time.monotonic()))
            return "ok"

        return call

    df = _prompts_df(spark, 8, partitions=1)
    assert complete_prompts(df, transport_loader=stamping_loader,
                            requests_per_sec=10.0).count() == 8
    stamps = sorted(
        float(open(os.path.join(mark_dir, f)).read()) for f in os.listdir(mark_dir)
    )
    assert len(stamps) == 8
    assert stamps[-1] - stamps[0] >= 0.65, stamps[-1] - stamps[0]


def test_retry_then_success_counts_attempts(spark):
    def flaky_loader():
        attempts: dict[str, int] = {}

        def call(prompt: str) -> str:
            attempts[prompt] = attempts.get(prompt, 0) + 1
            if attempts[prompt] < 3:
                raise TimeoutError("transient")
            return "done"

        return call

    out = complete_prompts(
        _prompts_df(spark, 3, partitions=1),
        transport_loader=flaky_loader,
        requests_per_sec=10_000,
        max_retries=4,
        backoff_base_sec=0.01,
    ).collect()
    assert all(r.status == "ok" and r.completion == "done" and r.n_attempts == 3 for r in out)


def test_exhausted_retries_yield_error_row_not_exception(spark):
    def broken_loader():
        def call(prompt: str) -> str:
            raise ConnectionError("endpoint down")

        return call

    out = complete_prompts(
        _prompts_df(spark, 3),
        transport_loader=broken_loader,
        requests_per_sec=10_000,
        max_retries=2,
        backoff_base_sec=0.01,
    ).collect()
    # the job completes; failures are rows, not exceptions
    assert len(out) == 3
    assert all(r.status == "error" and r.completion is None and r.n_attempts == 2 for r in out)


def test_completion_partitioning_invariant(spark):
    a = sorted(map(tuple, complete_prompts(_prompts_df(spark, 12, 1),
                                           requests_per_sec=10_000).collect()))
    b = sorted(map(tuple, complete_prompts(_prompts_df(spark, 12, 6),
                                           requests_per_sec=10_000).collect()))
    assert a == b and len(a) == 12
