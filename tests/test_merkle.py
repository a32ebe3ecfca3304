"""Merkle root must equal an independent pure-Python fold."""

from __future__ import annotations

import hashlib

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.merkle import ZERO, merkle_root


def python_merkle_root(pairs: list[tuple[int, str]]) -> tuple[str, int]:
    level = [
        hashlib.sha256(f"{i}:{v}".encode()).hexdigest()
        for i, v in sorted(pairs, key=lambda p: p[0])
    ]
    depth = max(1, (len(level) - 1).bit_length())
    for _ in range(depth):
        nxt = []
        for j in range(0, len(level), 2):
            left = level[j]
            right = level[j + 1] if j + 1 < len(level) else ZERO
            nxt.append(hashlib.sha256((left + right).encode()).hexdigest())
        level = nxt
    assert len(level) == 1
    return level[0], depth


def test_merkle_root_matches_python(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    rows = [(r.c_custkey, r.c_name) for r in c.collect()]
    expected_root, expected_depth = python_merkle_root(rows)
    got = merkle_root(c, "c_custkey", "c_name").collect()[0]
    assert got.root == expected_root
    assert got.depth == expected_depth
    assert got.n_leaves == len(rows)


def test_merkle_root_changes_on_any_leaf(spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "X"), (3, "c")], "id long, v string")
    r1 = merkle_root(df1, "id", "v").collect()[0].root
    r2 = merkle_root(df2, "id", "v").collect()[0].root
    assert r1 != r2


def test_merkle_proof_verifies_and_rejects(spark):
    from kamiyo_hive_spark.operators.merkle import (
        merkle_proof,
        merkle_root,
        verify_merkle_proof,
    )

    rows = [(i, f"agent-{i}") for i in range(11)]  # non-power-of-two
    df = spark.createDataFrame(rows, "id long, v string")
    root = merkle_root(df, "id", "v").collect()[0].root
    proof = [r.asDict() for r in merkle_proof(df, "id", "v", 6).collect()]
    assert verify_merkle_proof(6, "agent-6", proof, root)
    assert not verify_merkle_proof(6, "agent-TAMPERED", proof, root)
    assert not verify_merkle_proof(7, "agent-7", proof, root)


import pytest


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 9, 16, 17, 33, 100])
def test_block_fold_edge_sizes(spark, n):
    """The aligned-block fold must equal the sequential reference fold
    at every topology edge: single leaf, exact powers of two (block
    boundary == tree boundary), one-over (a lone node folding against
    virtual zeros all the way up), and non-aligned tails — with
    block_bits small enough to force multi-block + top-fold paths."""
    rows = [(i * 7 + 1, f"v{i}") for i in range(n)]  # non-contiguous ids
    df = spark.createDataFrame(rows, "k long, v string")
    got = merkle_root(df, "k", "v", block_bits=2).collect()[0]
    expected_root, expected_depth = python_merkle_root([(k, v) for k, v in rows])
    assert got["root"] == expected_root
    assert got["depth"] == expected_depth
    assert got["n_leaves"] == n
