"""LLM pipeline operators (SURVEY §2.10, U1-U4) — deterministic paths.

The reference runs plan → execute → synthesize → critique over agent
outputs (kamiyo-hive `app/api/swarm/{plan,synthesize,critique}/route.ts`,
`lib/swarm-llm.server.ts`), with deterministic fallbacks when no LLM is
configured:
- U1 heuristic planner (`plan/route.ts:47-126`): keyword routing of a
  mission into ordered steps.
- U2 concat synthesis (`synthesize/route.ts:80-91`): deterministic
  concatenation of step outputs.
- U3 critique scoring (`critique/route.ts:41-96`): bounded 0-100 score
  with fix suggestions.
- U4 quality oracle fallback (`oracle.ts:146-175`): token-overlap
  similarity (implemented as `text_overlap_score` in operators/text.py).

Spark-first: the deterministic paths are pure column expressions (JVM,
codegen) — correctness-testable against DuckDB. The LLM-backed path is
the same operator shape with a `mapInPandas` batch-inference stage
(`llm_batch_infer` below): swap the scoring lambda for a model client
and nothing else changes. Tests run only the deterministic paths
(hermetic, per FIXTURES.md determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register


@register(
    "plan_heuristic",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS mission_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents WHERE doc_id < 100
    )
    SELECT mission_id, lang,
           CASE WHEN len(list_intersect(t, ['scan', 'filter', 'query'])) > 0
                THEN 'research' ELSE 'general' END AS step_1,
           CASE WHEN len(list_intersect(t, ['join', 'merge', 'group'])) > 0
                THEN 'integrate' ELSE 'draft' END AS step_2,
           CASE WHEN len(list_intersect(t, ['sort', 'window', 'order'])) > 0
                THEN 'rank' ELSE 'review' END AS step_3,
           least(CAST(3 + len(t) // 40 AS BIGINT), 12) AS max_steps
    FROM toks
    ORDER BY mission_id
    """,
    tags=("U1", "llm-plan"),
)
def plan_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 heuristic planner: keyword routing of a mission text into a
    bounded, ordered step list (max 12 steps, `runs/route.ts:78`) — the
    deterministic fallback the reference uses without an LLM."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")

    def route(keywords: list[str], then: str, otherwise: str) -> F.Column:
        kw = F.array(*[F.lit(k) for k in keywords])
        return F.when(F.size(F.array_intersect(t, kw)) > 0, then).otherwise(otherwise)

    return d.select(
        F.col("doc_id").alias("mission_id"),
        "lang",
        route(["scan", "filter", "query"], "research", "general").alias("step_1"),
        route(["join", "merge", "group"], "integrate", "draft").alias("step_2"),
        route(["sort", "window", "order"], "rank", "review").alias("step_3"),
        F.least(
            (F.lit(3) + (F.size(t) / 40).cast("long")).cast("long"), F.lit(12).cast("long")
        ).alias("max_steps"),
    )


@register(
    "synthesize_concat",
    oracle="""
    SELECT source AS run_id,
           string_agg(substr(text, 1, 40), ' | ' ORDER BY doc_id) AS final_text,
           count(*) AS n_steps,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id < 200
    GROUP BY source
    ORDER BY run_id
    """,
    tags=("U2", "llm-synthesize"),
)
def synthesize_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 concat synthesis: step outputs of a run concatenated in step
    order — the deterministic fallback (`synthesize/route.ts:80-91`).
    collect_list carries (order-key, text) structs; array_sort fixes the
    order inside each group, so the result is partition-independent."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        d.groupBy(F.col("source").alias("run_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", F.substring("text", 1, 40).alias("s")))
                    ),
                    lambda x: x["s"],
                ),
                " | ",
            ).alias("final_text"),
            F.count("*").alias("n_steps"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
    )


@register(
    "critique_score",
    oracle="""
    SELECT doc_id AS run_id,
           least(greatest(
             CAST(40
                  + 30 * CAST(len(regexp_extract_all(lower(text), '\\b(join|group|window)\\b')) > 0 AS INT)
                  + (length(text) // 50)
                  - 20 * CAST(length(text) < 120 AS INT) AS BIGINT),
             0), 100) AS score,
           (least(greatest(
             CAST(40
                  + 30 * CAST(len(regexp_extract_all(lower(text), '\\b(join|group|window)\\b')) > 0 AS INT)
                  + (length(text) // 50)
                  - 20 * CAST(length(text) < 120 AS INT) AS BIGINT),
             0), 100) >= 70) AS critique_ok
    FROM documents
    WHERE doc_id < 100
    ORDER BY run_id
    """,
    tags=("U3", "llm-critique"),
)
def critique_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 critique: bounded 0-100 score (clamped exactly as
    `critique/route.ts:57`) + pass flag at threshold 70 — deterministic
    feature-based scoring standing in for the LLM judge."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    has_kw = F.regexp_count(F.lower(F.col("text")), F.lit(r"\b(join|group|window)\b")) > 0
    raw = (
        F.lit(40)
        + 30 * has_kw.cast("int")
        + F.floor(F.length("text") / 50)
        - 20 * (F.length("text") < 120).cast("int")
    ).cast("long")
    score = F.least(F.greatest(raw, F.lit(0).cast("long")), F.lit(100).cast("long"))
    return d.select(
        F.col("doc_id").alias("run_id"),
        score.alias("score"),
        (score >= 70).alias("critique_ok"),
    )


def _infer_kit():
    """LLM client contract, built as NESTED functions/classes so
    cloudpickle ships them BY VALUE to executor workers (module-level
    names pickle by reference, and `kamiyo_hive_spark` is only on the
    driver's sys.path under the external harness — caught live by the
    /tmp-cwd driver simulation). Driver-side module aliases below are
    the same objects, usable in unit tests."""

    class LLMOutputError(ValueError):
        """The backend returned a malformed batch (wrong length, nulls,
        or non-string values) — surfaced instead of silently writing
        bad rows."""

    def validate_output(out, n_prompts: int):
        """Output-schema enforcement: exactly one non-null string per
        prompt. A real LLM client can drop, truncate, or null responses
        on partial failures; letting that through corrupts the column."""
        import pandas as pd

        if not isinstance(out, pd.Series):
            out = pd.Series(list(out)) if hasattr(out, "__iter__") else None
        if out is None or len(out) != n_prompts:
            got = "non-iterable" if out is None else f"{len(out)} rows"
            raise LLMOutputError(f"backend returned {got} for {n_prompts} prompts")
        if out.isna().any():
            raise LLMOutputError("backend returned null responses")
        if not all(isinstance(v, str) for v in out):
            raise LLMOutputError("backend returned non-string responses")
        return out.reset_index(drop=True)

    def infer_with_retry(
        fn,
        prompts,
        *,
        max_retries: int = 3,
        backoff_base_s: float = 0.05,
        backoff_mult: float = 2.0,
        sleep=None,
    ):
        """One batch call with validation + exponential-backoff retry —
        the client contract of the reference's swarm SDK (bounded
        attempts, multiplicative backoff; kamiyo-hive
        `packages/hive-sdk/src/swarmteams/client.ts:174-232`). Retries
        on ANY backend exception including malformed output; re-raises
        the last error once attempts are exhausted. `sleep` is
        injectable so tests can assert the exact backoff schedule."""
        import time as _time

        do_sleep = sleep if sleep is not None else _time.sleep
        delay = backoff_base_s
        last = None
        for attempt in range(max_retries + 1):
            if attempt:
                do_sleep(delay)
                delay *= backoff_mult
            try:
                return validate_output(fn(prompts), len(prompts))
            except Exception as e:  # noqa: BLE001 — client contract: retry anything
                last = e
        raise last

    return LLMOutputError, validate_output, infer_with_retry


LLMOutputError, _validate_output, infer_with_retry = _infer_kit()


def llm_batch_infer(
    df: DataFrame,
    text_col: str,
    out_col: str,
    infer_fn: Callable[[pd.Series], pd.Series] | None = None,
    batch_size: int = 64,
    max_retries: int = 3,
    backoff_base_s: float = 0.05,
    backoff_mult: float = 2.0,
    max_concurrency: int = 4,
) -> DataFrame:
    """The LLM-backed operator shape: Arrow-batched `mapInPandas` over a
    text column, pluggable backend, production client semantics.

    `infer_fn` receives a pandas Series of prompts and returns a Series
    of responses (default: deterministic echo so tests are hermetic).
    Per Arrow batch, prompts are sliced into `batch_size` chunks and
    dispatched over a bounded thread pool. `max_concurrency` bounds
    in-flight calls PER TASK (the pool lives in the mapInPandas
    worker), so the cluster-wide ceiling is
    `concurrent tasks × max_concurrency` — size it as
    endpoint_rate_limit / (executors × cores-per-executor), or cap the
    stage's task count (`df.coalesce(n)`) when the endpoint budget is
    smaller than the cluster's parallelism. Every
    call is wrapped in `infer_with_retry` (validation + exponential
    backoff), and results reassemble in row order regardless of
    completion order.

    This is the only Python-side operator in the family, and it is
    Arrow-vectorized end to end; at 100 TB the bottleneck is the model
    endpoint, not Spark — which is exactly what the concurrency bound
    governs.
    """
    from pyspark.sql import types as T

    # deterministic echo default (a LAMBDA, shipped by value) so tests
    # stay hermetic; `retry` is the kit's nested function, also by value
    fn = infer_fn or (lambda s: "synth:" + s.str.slice(0, 24))
    retry = infer_with_retry
    # copy the fields: StructType.add would mutate df's cached schema
    schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                chunks = [
                    pdf.iloc[start : start + batch_size].copy()
                    for start in range(0, len(pdf), batch_size)
                ]
                futures = [
                    pool.submit(
                        retry,
                        fn,
                        chunk[text_col],
                        max_retries=max_retries,
                        backoff_base_s=backoff_base_s,
                        backoff_mult=backoff_mult,
                    )
                    for chunk in chunks
                ]
                for chunk, fut in zip(chunks, futures):  # row order preserved
                    chunk[out_col] = fut.result().values
                    yield chunk

    return df.mapInPandas(run, schema=schema)


@register(
    "llm_infer_stub",
    oracle="""
    SELECT doc_id, concat('synth:', substr(text, 1, 24)) AS response
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    tags=("U1", "mapInPandas", "llm-infer"),
    bench=False,
)
def llm_infer_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas inference operator with its deterministic default
    backend — proves the Arrow batch plumbing (schema evolution, batch
    slicing) against a SQL oracle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select("doc_id", "text")
    return llm_batch_infer(d, "text", "response").select("doc_id", "response")
