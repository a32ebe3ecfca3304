"""DSv2 REST connector tests: the pushdown proof is the SERVER's
request log and transfer counter, not plan text — the predicate must
arrive as query params and only matching rows may cross the wire."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamiyo_hive_spark.sources.restds import (
    OrdersApiServer,
    OrdersRestDataSource,
    orders_api_rows,
)


def _remote(spark, srv, page_size=5000):
    spark.dataSource.register(OrdersRestDataSource)
    return (
        spark.read.format("rest_orders")
        .option("base_url", srv.base_url)
        .option("page_size", str(page_size))
        .load()
    )


def _with_pushdown(spark, enabled: bool):
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get(
                "spark.sql.python.filterPushdown.enabled"
            )
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled",
                "true" if enabled else "false",
            )

        def __exit__(self, *a):
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", self.prev
            )

    return _Ctx()


def test_predicates_arrive_at_server_and_prune_transfer(spark, sf_dir):
    rows = orders_api_rows(spark, sf_dir)
    matching = [r for r in rows if r[2] == "F" and r[3] >= 100000.0]
    with OrdersApiServer(rows) as srv, _with_pushdown(spark, True):
        got = (
            _remote(spark, srv)
            .filter(F.col("o_orderstatus") == "F")
            .filter(F.col("o_totalprice") >= 100000.0)
            .count()
        )
        data_reqs = [q for p, q in srv.requests if p == "/orders"]
        assert data_reqs, "no data requests logged"
        for q in data_reqs:
            assert "status_eq=F" in q and "price_ge=" in q
        assert srv.rows_served == len(matching) < len(rows)
    assert got == len(matching)


def test_unsupported_filter_is_reapplied_by_spark(spark, sf_dir):
    rows = orders_api_rows(spark, sf_dir)
    with OrdersApiServer(rows) as srv, _with_pushdown(spark, True):
        got = (
            _remote(spark, srv)
            .filter(F.col("o_orderstatus") == "F")
            .filter(F.col("o_custkey") % 3 == 0)
            .count()
        )
        # the modulo predicate must NOT appear in any request
        assert all("custkey" not in q for _, q in srv.requests)
        # ...but the server-side status filter must
        assert any("status_eq=F" in q for p, q in srv.requests if p == "/orders")
    want = len([r for r in rows if r[2] == "F" and r[1] % 3 == 0])
    assert got == want


def test_disabled_pushdown_fails_loud_not_silent(spark, sf_dir):
    """Spark REFUSES to run a pushFilters-implementing reader when the
    conf is off ([DATA_SOURCE_PUSHDOWN_DISABLED]) rather than silently
    skipping the pushdown — pin that loud contract so a misconfigured
    session can never quietly transfer the whole remote table."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    rows = orders_api_rows(spark, sf_dir)[:100]
    with OrdersApiServer(rows) as srv, _with_pushdown(spark, False):
        with pytest.raises(
            AnalysisException, match="DATA_SOURCE_PUSHDOWN_DISABLED"
        ):
            _remote(spark, srv).filter(
                F.col("o_orderstatus") == "F"
            ).count()


def test_parallel_offset_pages_reassemble_exactly(spark, sf_dir):
    """Small pages -> many partitions: every row exactly once, values
    bit-exact vs the source table (timestamps via unix_micros)."""
    rows = orders_api_rows(spark, sf_dir)
    n = len(rows)
    page = max(1, n // 7)
    with OrdersApiServer(rows) as srv, _with_pushdown(spark, True):
        remote = _remote(spark, srv, page_size=page).localCheckpoint()
        npages = len([1 for p, _ in srv.requests if p == "/orders"])
        assert npages == -(-n // page)  # ceil(n / page)
    from kamiyo_hive_spark.catalog import table

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").alias("o_orderdate"),
    )
    assert remote.count() == n
    sym = remote.exceptAll(src).count() + src.exceptAll(remote).count()
    assert sym == 0


def test_timestamp_roundtrip_is_exact_beyond_float_precision(spark):
    """ADVICE r6(b) regression: the reader reconstructs timestamps with
    exact integer micros (epoch + timedelta), never float seconds.
    2**53 + 1 microseconds (year 2255) is not representable as a double
    after /1e6, so the old fromtimestamp(ts_us/1e6) path loses the
    final microsecond — the exact path must round-trip it bit-for-bit."""
    boundary_us = 2**53 + 1
    assert float(boundary_us / 1e6) * 1e6 != boundary_us  # the hazard
    rows = [(1, 7, "O", 100.0, boundary_us), (2, 8, "F", 50.0, 1_000_001)]
    with OrdersApiServer(rows) as srv, _with_pushdown(spark, True):
        got = (
            _remote(spark, srv)
            .select("o_orderkey", F.unix_micros("o_orderdate").alias("us"))
            .collect()
        )
    by_key = {r.o_orderkey: r.us for r in got}
    assert by_key == {1: boundary_us, 2: 1_000_001}
