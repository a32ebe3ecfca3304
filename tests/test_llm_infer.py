"""LLM batch-inference client contract: batch sizing, retry/backoff,
output-schema enforcement, bounded concurrency (VERDICT r1 item 8,
mirroring the reference SDK's client semantics —
`packages/hive-sdk/src/swarmteams/client.ts:174-232`)."""

from __future__ import annotations

import pandas as pd
import pytest

from kamiyo_hive_spark.operators.llm_pipeline import (
    LLMOutputError,
    infer_with_retry,
    llm_batch_infer,
)


# -- driver-side contract tests (pure Python, no Spark) --


def test_retry_backoff_schedule_and_recovery():
    calls, sleeps = [], []

    def flaky(s: pd.Series) -> pd.Series:
        calls.append(len(s))
        if len(calls) <= 2:
            raise ConnectionError("rate limited")
        return "ok:" + s

    out = infer_with_retry(
        flaky,
        pd.Series(["a", "b"]),
        max_retries=3,
        backoff_base_s=0.05,
        backoff_mult=2.0,
        sleep=sleeps.append,
    )
    assert list(out) == ["ok:a", "ok:b"]
    assert len(calls) == 3  # failed, failed, succeeded
    assert sleeps == [0.05, 0.1]  # exponential schedule, no sleep before 1st


def test_retry_exhaustion_reraises_last_error():
    def always_down(s: pd.Series) -> pd.Series:
        raise TimeoutError("model endpoint down")

    with pytest.raises(TimeoutError):
        infer_with_retry(
            always_down, pd.Series(["x"]), max_retries=2, sleep=lambda _: None
        )


@pytest.mark.parametrize(
    "bad_fn, msg",
    [
        (lambda s: s.iloc[:-1], "rows"),  # dropped a response
        (lambda s: pd.Series(["ok"] + [None] * (len(s) - 1)), "null"),
        (lambda s: pd.Series([1] * len(s)), "non-string"),
    ],
)
def test_output_schema_enforced(bad_fn, msg):
    with pytest.raises(LLMOutputError, match=msg):
        infer_with_retry(
            bad_fn, pd.Series(["a", "b", "c"]), max_retries=0, sleep=lambda _: None
        )


# -- Spark-side integration: batching + concurrency produce exactly the
#    sequential result, and batch sizing actually splits the work --


def test_batched_concurrent_matches_sequential(spark, sf_dir):
    from kamiyo_hive_spark.catalog import table

    # defined in-function so cloudpickle ships it by VALUE to workers
    # (the tests package is not importable there); tags each response
    # with its batch size so the test can see how prompts were chunked
    def marking_backend(s: pd.Series) -> pd.Series:
        return s + f"#b{len(s)}"

    d = (
        table(spark, sf_dir, "documents")
        .filter("doc_id < 40")
        .select("doc_id", "text")
    )
    seq = {
        r.doc_id: r.response
        for r in llm_batch_infer(
            d, "text", "response", marking_backend, batch_size=7, max_concurrency=1
        ).collect()
    }
    par = {
        r.doc_id: r.response
        for r in llm_batch_infer(
            d, "text", "response", marking_backend, batch_size=7, max_concurrency=4
        ).collect()
    }
    assert seq == par and len(seq) == 40
    # batch sizing respected: no chunk exceeded batch_size
    sizes = {int(v.rsplit("#b", 1)[1]) for v in seq.values()}
    assert max(sizes) <= 7


def test_malformed_backend_fails_job(spark, sf_dir):
    from kamiyo_hive_spark.catalog import table

    def truncating_backend(s: pd.Series) -> pd.Series:
        return s.iloc[: len(s) // 2]

    d = table(spark, sf_dir, "documents").filter("doc_id < 10").select("doc_id", "text")
    bad = llm_batch_infer(
        d, "text", "response", truncating_backend, max_retries=0
    )
    with pytest.raises(Exception, match="LLMOutputError|rows"):
        bad.collect()


# -- dependency-free multimodal codec (driver-side unit checks) --


def test_bmp_roundtrip_and_padding():
    from kamiyo_hive_spark.operators.multimodal import decode_bmp, encode_bmp

    # width 5 → row 15 bytes → 1 pad byte/row; pixel value 200
    d = decode_bmp(encode_bmp(5, 3, 200))
    assert (d["width"], d["height"]) == (5, 3)
    # zero pad bytes must be EXCLUDED from the mean
    assert d["mean_value"] == 200.0


def test_wav_roundtrip():
    from kamiyo_hive_spark.operators.multimodal import decode_wav, encode_wav

    d = decode_wav(encode_wav(11000, -123, 77))
    assert d["sample_rate"] == 11000
    assert d["n_samples"] == 77
    assert d["mean_value"] == 123.0


def test_unknown_codecs_fail_fast():
    import pytest as _pytest

    from kamiyo_hive_spark.operators.multimodal import decode_bmp, decode_wav

    with _pytest.raises(NotImplementedError):
        decode_bmp(b"\xff\xd8\xff\xe0 jpeg bytes")
    with _pytest.raises(NotImplementedError):
        decode_wav(b"\x00\x00\x00\x20ftypmp4 bytes")
