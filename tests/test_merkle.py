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


def test_proof_multiblock_and_bounded_driver_rows(spark, sf_dir):
    """VERDICT r4 task 6: proof generation must never collect the leaf
    set. Planted leaf at a multi-block size (block_bits=2 forces
    in-block + top-fold paths); driver traffic is pinned to
    block-roots + in-block path rows."""
    from kamiyo_hive_spark.operators.merkle import (
        ZERO,
        _blockwise_proof,
        merkle_root,
        verify_merkle_proof,
    )

    n = 37
    rows = [(i, f"agent-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v string")
    root = merkle_root(df, "id", "v", block_bits=2).collect()[0].root

    def leaf_hash(i, v):
        import hashlib

        return hashlib.sha256(f"{i}:{v}".encode()).hexdigest()

    def pair_hash(a, b):
        import hashlib

        return hashlib.sha256((a + b).encode()).hexdigest()

    path, got_root, n_driver_rows = _blockwise_proof(
        df,
        "id",
        "v",
        23,
        leaf_hash=leaf_hash,
        pair_hash=pair_hash,
        zero_at=lambda lvl: ZERO,
        to_str=lambda x: x,
        from_str=lambda s: s,
        block_bits=2,
    )
    assert got_root == root
    proof = [
        {
            "level": p["level"],
            "sibling_hash": p["sibling"],
            "sibling_is_left": p["sibling_is_left"],
        }
        for p in path
    ]
    assert verify_merkle_proof(23, "agent-23", proof, root)
    assert not verify_merkle_proof(23, "agent-TAMPER", proof, root)
    # 37 leaves, 4-leaf blocks -> 10 block roots + 2 in-block path rows
    assert n_driver_rows == 12
    assert n_driver_rows < n


def test_poseidon_proof_at_scale_factor(spark, sf_dir):
    """Planted-leaf Poseidon proof straight off the customer table —
    the distributed path end-to-end at a real scale factor."""
    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.operators.merkle import (
        merkle_proof_poseidon,
        merkle_root_poseidon,
        verify_poseidon_proof,
    )

    c = table(spark, sf_dir, "customer")
    target = c.select("c_custkey", "c_name").orderBy("c_custkey").limit(5).collect()[3]
    proof, root = merkle_proof_poseidon(c, "c_custkey", "c_name", target["c_custkey"])
    spark_root = int(
        merkle_root_poseidon(c, "c_custkey", "c_name").collect()[0]["root"], 16
    )
    assert root == spark_root
    assert verify_poseidon_proof(target["c_custkey"], target["c_name"], proof, root)
    assert not verify_poseidon_proof(
        target["c_custkey"], target["c_name"] + "x", proof, root
    )
