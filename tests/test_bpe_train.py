"""BPE trainer tests: boundary safety and application arithmetic the
hash replay can't name directly."""

from __future__ import annotations

from kamiyo_hive_spark.operators.retrieval import BPE_ROUNDS, bpe_train_merges


def test_merge_encoding_boundary_safety():
    """The doubled-separator encoding makes merge application a literal
    replace that can never match inside a multi-char symbol, and
    resolves overlap runs leftmost-non-overlapping — the exact
    semantics both engines replay."""

    def enc(syms):
        return " " + "  ".join(syms) + " "

    def apply(s, l, r):
        return s.replace(f" {l}  {r} ", f" {l}{r} ")

    # 'er' merged; a later (e, r) pair inside symbol 'er' must not match
    s = apply(enc(list("erer")), "e", "r")
    assert s == enc(["er", "er"])
    # multi-char false-positive: symbols ['xe', 'r'] must NOT merge (e,r)
    assert apply(enc(["xe", "r"]), "e", "r") == enc(["xe", "r"])
    # overlap run: aaa -> (aa, a), aaaa -> (aa, aa)
    assert apply(enc(list("aaa")), "a", "a") == enc(["aa", "a"])
    assert apply(enc(list("aaaa")), "a", "a") == enc(["aa", "aa"])


def test_rounds_shrink_corpus_consistently(spark, sf_dir):
    """Each applied merge removes exactly one symbol per application;
    applications are between pair_count/2 (all-overlapping run) and
    pair_count (no overlaps). Symbol counts must honor that band and
    decrease strictly."""
    rows = {r["round"]: r for r in bpe_train_merges(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, BPE_ROUNDS + 1))
    prev = None
    for r in sorted(rows):
        row = rows[r]
        assert row["merged"] == row["left_sym"] + row["right_sym"]
        if prev is not None:
            applied = prev["corpus_symbols_after"] - row["corpus_symbols_after"]
            assert 0 < applied <= row["pair_count"]
            assert applied * 2 >= row["pair_count"]
        prev = row
    # counts are non-increasing across rounds (argmax property: a later
    # round's best pair can't beat an earlier round's best on the same
    # corpus, and merges only remove pair occurrences of the merged pair
    # itself... new pairs CAN appear, so only sanity-check positivity)
    assert all(rows[r]["pair_count"] > 0 for r in rows)
