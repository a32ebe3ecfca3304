"""Property tests for the partition-token layer of the txlog.

Every pruning and commutativity decision flows through ONE encoding:
partition values are Hive-escaped into ``spec=token`` path components
at write time, and `pruned_file_sets` / `_spec_values` / `_conflicts`
reason about the ESCAPED tokens. The bug class this guards is encoding
asymmetry (ADVICE r8/r9 mediums: raw compares silently pruning to
nothing, URI-double-encoding making DV keys mismatch): hypothesis
drives hostile values ('/', '=', '%', ':', spaces, '+', unicode)
through the real write-shaped paths and checks each decision against a
model that only ever sees the ORIGINAL unescaped values. Escaping is
injective, so value-level and token-level answers must agree exactly.

Pure path/manifest metadata — no SparkSession.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from kamiyo_hive_spark.sources.txlog import (
    Commit,
    TxLog,
    escape_path_name,
    unescape_path_name,
)

# hostile alphabet: every char class the escaper must handle, plus
# plain text and non-ASCII
_VALUE = st.text(
    alphabet="ab7/:=% +.\\#*?'é",
    min_size=1,
    max_size=8,
).filter(lambda s: s not in (".", ".."))


@settings(max_examples=200, deadline=None)
@given(_VALUE)
def test_escape_roundtrip_and_path_safety(v):
    tok = escape_path_name(v)
    assert unescape_path_name(tok) == v
    # the token must be a single safe path component: no separators,
    # no layout '=' (a literal '=' inside a VALUE may never fake a
    # spec boundary — _spec_token takes the FIRST '=' as separator)
    assert os.sep not in tok
    assert "=" not in tok
    assert "\x00" not in tok


@settings(max_examples=50, deadline=None)
@given(
    st.lists(_VALUE, min_size=1, max_size=6, unique=True),
    st.integers(1, 3),  # files per partition value
    st.integers(0, 2),  # spec-less (unprunable) files
    st.data(),
)
def test_pruned_file_sets_matches_value_model(values, per, flat, data):
    """`pruned_file_sets(spec, query_values)` must return exactly the
    files written under a queried ORIGINAL value (match decided at the
    value level, blind to escaping) plus every spec-less file as
    unprunable."""
    root = tempfile.mkdtemp(prefix="txlog_spec_")
    try:
        log = TxLog.init(root)
        by_value: dict = {}
        adds = []
        for i, v in enumerate(values):
            tok = escape_path_name(v)
            for j in range(per):
                rel = os.path.join("data", "s", f"shard={tok}",
                                   f"p{i}_{j}.parquet")
                path = os.path.join(root, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                open(path, "wb").write(b"x")
                by_value.setdefault(v, []).append(rel)
                adds.append(rel)
        flats = []
        for j in range(flat):
            rel = os.path.join("data", "f", f"p{j}.parquet")
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            open(path, "wb").write(b"x")
            flats.append(rel)
            adds.append(rel)
        log.commit("append", adds, spec="shard")

        query = data.draw(st.lists(st.sampled_from(values) | _VALUE,
                                   min_size=1, max_size=4))
        matching, unprunable = log.pruned_file_sets("shard", query)
        want_match = sorted(
            f for v in set(query) for f in by_value.get(v, [])
        )
        assert sorted(matching) == want_match
        assert sorted(unprunable) == sorted(flats)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _commit(adds=(), removes=(), dvs=None):
    return Commit(
        version=0, op="rewrite", adds=list(adds), removes=list(removes),
        dvs=dict(dvs) if dvs else None,
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_VALUE, min_size=2, max_size=5, unique=True),
    st.data(),
)
def test_conflicts_relaxation_matches_value_disjointness(values, data):
    """`_conflicts` may admit a spec'd rewrite over intervening commits
    ONLY when the value-level model proves row-disjointness: every file
    on both sides is spec-encoded, the ORIGINAL value sets are
    disjoint, and no intervening commit carries deletion vectors
    (file-less DV commits prove nothing about partitions — the r10
    rule). Admission in any other case would be a serializability
    hole; refusal when the model admits is allowed to be conservative,
    but exact agreement is asserted here to pin the encoding symmetry
    (escaping is injective, so token-disjoint ⟺ value-disjoint)."""
    def f_of(v, tag):
        return os.path.join("data", tag, f"shard={escape_path_name(v)}",
                            "p.parquet")

    mine_vals = data.draw(st.lists(st.sampled_from(values),
                                   min_size=1, max_size=3))
    theirs_vals = data.draw(st.lists(st.sampled_from(values),
                                     min_size=1, max_size=3))
    mine_flat = data.draw(st.booleans())
    theirs_flat = data.draw(st.booleans())
    with_dv = data.draw(st.booleans())

    adds = [f_of(v, "m") for v in mine_vals]
    removes = [f_of(v, "b") for v in mine_vals]
    if mine_flat:
        adds.append(os.path.join("data", "m", "flat.parquet"))
    their_files = [f_of(v, "t") for v in theirs_vals]
    if theirs_flat:
        their_files.append(os.path.join("data", "t", "flat.parquet"))
    dvs = {their_files[0]: ["data/dv/p.parquet"]} if with_dv else None
    intervening = [_commit(adds=their_files, dvs=dvs)]

    got = TxLog._conflicts(
        "rewrite", intervening, adds=adds, removes=removes, spec="shard"
    )
    model_admits = (
        not mine_flat
        and not theirs_flat
        and not with_dv
        and not (set(mine_vals) & set(theirs_vals))
    )
    assert (got is None) == model_admits, (
        f"mine={mine_vals!r} theirs={theirs_vals!r} flat=({mine_flat},"
        f"{theirs_flat}) dv={with_dv} -> {got!r}"
    )
