"""Live-wire LLM backend integration tests: what the unit tests prove
with fakes, these prove over a real socket — retries absorb transient
500s, malformed batches fail loud after retries, and the per-task
concurrency bound actually bounds in-flight requests at the endpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.llm_http import (
    LLMStubServer,
    http_infer_fn,
    synth_completion,
)
from kamiyo_hive_spark.operators.llm_pipeline import llm_batch_infer


def _docs(spark, sf_dir, n=50):
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def test_http_backend_matches_hermetic_default(spark, sf_dir):
    d = _docs(spark, sf_dir)
    want = {
        (r["doc_id"], synth_completion(r["text"]))
        for r in d.collect()
    }
    with LLMStubServer() as srv:
        got = {
            (r["doc_id"], r["response"])
            for r in llm_batch_infer(
                d, "text", "response", infer_fn=http_infer_fn(srv.base_url)
            ).collect()
        }
        assert srv.prompts_served == len(want)
    assert got == want


def test_transient_500s_recovered_by_retry(spark, sf_dir):
    d = _docs(spark, sf_dir, n=20).repartition(1)
    with LLMStubServer(fail_first_n=2) as srv:
        rows = llm_batch_infer(
            d,
            "text",
            "response",
            infer_fn=http_infer_fn(srv.base_url),
            batch_size=8,
            backoff_base_s=0.01,
        ).collect()
        # every failed POST was retried: requests > successful batches
        assert srv.requests > -(-20 // 8)
    assert len(rows) == 20
    assert all(r["response"].startswith("synth:") for r in rows)


def test_malformed_batch_fails_loud_after_retries(spark, sf_dir):
    from pyspark.errors.exceptions.captured import PythonException

    d = _docs(spark, sf_dir, n=20).repartition(1)
    with LLMStubServer(malformed=True) as srv:
        with pytest.raises(PythonException) as ei:
            llm_batch_infer(
                d,
                "text",
                "response",
                infer_fn=http_infer_fn(srv.base_url),
                batch_size=8,
                max_retries=1,
                backoff_base_s=0.01,
            ).collect()
        # the server was retried, then the validation error surfaced
        assert srv.requests >= 2
    assert "LLMOutputError" in str(ei.value)


def test_endpoint_concurrency_bounded_per_task(spark, sf_dir):
    d = _docs(spark, sf_dir).repartition(1)  # ONE task -> one pool
    with LLMStubServer() as srv:
        llm_batch_infer(
            d,
            "text",
            "response",
            infer_fn=http_infer_fn(srv.base_url),
            batch_size=2,  # many small chunks -> pool saturated
            max_concurrency=3,
        ).collect()
        assert srv.requests >= 10
        assert srv.max_inflight <= 3
