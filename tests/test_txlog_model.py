"""Model-based metadata replay test for the transaction log.

The txlog's three replay surfaces — `snapshot_files`, `dv_state`,
`file_stats` — each resolve from the NEAREST CHECKPOINT plus a bounded
commit walk (r10). The checkpoint payloads have subtly different
retention rules (files: live set; dvs: live-filtered, re-adds carry
their own payload; stats: CUMULATIVE, live-filtered at return), and
history shapes like remove-then-re-add straddling a checkpoint
boundary are exactly where a rule slip silently degrades or corrupts
(r10 review find: live-filtered stats checkpoints lost stats for
re-added files).

Hypothesis drives random commit histories — appends, rewrites,
removals, DV attachments, restore-style re-adds carrying payloads —
across multiple checkpoint boundaries, and compares EVERY version's
replay against a 30-line pure-Python model that never checkpoints.
Pure manifest metadata: no SparkSession, millisecond examples.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from kamiyo_hive_spark.sources.txlog import CHECKPOINT_EVERY, TxLog


def _touch(root: str, rel: str) -> str:
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"x")
    return rel


class _Model:
    """Brute-force replay semantics, no checkpoints ever."""

    def __init__(self):
        self.commits: list[dict] = []

    def apply(self, adds, removes, stats, dvs):
        self.commits.append(
            {"adds": list(adds), "removes": list(removes),
             "stats": dict(stats or {}), "dvs": dict(dvs or {})}
        )

    def files(self, v: int) -> set:
        out: set = set()
        for c in self.commits[: v + 1]:
            out.difference_update(c["removes"])
            out.update(c["adds"])
        return out

    def dv_state(self, v: int) -> dict:
        state: dict = {}
        for c in self.commits[: v + 1]:
            for f in c["removes"]:
                state.pop(f, None)
            for f, dl in c["dvs"].items():
                state.setdefault(f, []).extend(dl)
        live = self.files(v)
        return {f: dl for f, dl in state.items() if f in live}

    def file_stats(self, v: int) -> dict:
        out: dict = {}
        for c in self.commits[: v + 1]:
            out.update(c["stats"])
        live = self.files(v)
        return {f: st_ for f, st_ in out.items() if f in live}


# Each step is (op, seed ints); interpretation happens against the
# evolving state so every generated history is valid by construction.
_STEP = st.tuples(
    st.sampled_from(["append", "rewrite", "dv", "readd"]),
    st.integers(0, 10**6),
    st.booleans(),  # carry stats?
)

_STEP_VAC = st.tuples(
    st.sampled_from(["append", "rewrite", "dv", "readd", "vac"]),
    st.integers(0, 10**6),
    st.booleans(),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_STEP_VAC, min_size=CHECKPOINT_EVERY + 2,
                max_size=3 * CHECKPOINT_EVERY + 5))
def test_checkpointed_replay_equals_model(steps):
    """Includes interleaved `vacuum` (retain_seconds=0): GC never
    changes any RETURNED metadata map — it unlinks unreferenced bytes,
    and the next checkpoint prunes the unlinked paths' stats entries,
    which can never be re-referenced (re-adds stage new uuid paths; the
    harness mirrors that by dropping vacuumed paths from the re-add
    pool)."""
    from kamiyo_hive_spark.sources.txlog import vacuum

    root = tempfile.mkdtemp(prefix="txlog_model_")
    try:
        log = TxLog.init(root)
        model = _Model()
        live: list[str] = []
        dead: list[str] = []  # removed paths, candidates for re-add
        declared: dict = {}  # path -> first-declared stats (immutable)
        n = 0

        for op, seed, with_stats in steps:
            n += 1
            if op == "vac":
                vacuum(log, retain_versions=2, retain_seconds=0.0)
                dead = [
                    f for f in dead
                    if os.path.exists(os.path.join(root, f))
                ]
                continue
            if op == "append" or (op in ("rewrite", "dv") and not live) or (
                op == "readd" and not dead
            ):
                f = _touch(root, f"data/a{n}/p.parquet")
                stats = {f: {"c": [seed % 50, seed % 50 + 5]}} if with_stats else None
                if stats:
                    declared[f] = stats[f]
                log.commit("append", [f], stats=stats)
                model.apply([f], [], stats, None)
                live.append(f)
            elif op == "rewrite":
                victim = live.pop(seed % len(live))
                f = _touch(root, f"data/r{n}/p.parquet")
                stats = {f: {"c": [seed % 50, seed % 50 + 5]}} if with_stats else None
                if stats:
                    declared[f] = stats[f]
                log.commit(
                    "rewrite", adds=[f], removes=[victim],
                    read_version=log.version(), stats=stats,
                )
                model.apply([f], [victim], stats, None)
                dead.append(victim)
                live.append(f)
            elif op == "dv":
                victim = live[seed % len(live)]
                dv = _touch(root, f"data/dv{n}/p.parquet")
                log.commit(
                    "rewrite", adds=[], removes=[],
                    read_version=log.version(), dvs={victim: [dv]},
                )
                model.apply([], [], None, {victim: [dv]})
            else:  # re-add a dead path, restore-style payload or bare
                f = dead.pop(seed % len(dead))
                # stats are a pure function of the path's immutable
                # bytes: a re-add may only carry the ORIGINAL stats
                # (restore/clone semantics) or none at all
                stats = (
                    {f: declared[f]} if with_stats and f in declared
                    else None
                )
                dvs = None
                if seed % 3 == 0:
                    dv = _touch(root, f"data/dvr{n}/p.parquet")
                    dvs = {f: [dv]}
                log.commit("append", [f], stats=stats, dvs=dvs)
                model.apply([f], [], stats, dvs)
                live.append(f)

        latest = log.version()
        assert latest == len(model.commits) - 1
        # checkpoints genuinely landed once enough commits minted
        # (vac steps commit nothing, so short histories may stay
        # below the interval — those still exercise the no-cp path)
        if latest + 1 >= CHECKPOINT_EVERY:
            assert any(
                name.endswith(".checkpoint.json")
                for name in os.listdir(log.logdir)
            )
        for v in range(latest + 1):
            assert set(log.snapshot_files(v)) == model.files(v), f"files@v{v}"
            assert log.dv_state(v) == model.dv_state(v), f"dvs@v{v}"
            assert log.file_stats(v) == model.file_stats(v), f"stats@v{v}"
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(_STEP, min_size=CHECKPOINT_EVERY + 2,
             max_size=2 * CHECKPOINT_EVERY + 5),
    st.integers(0, 10**6),
)
def test_restore_and_clone_reproduce_model_state(steps, pick):
    """`restore(v)` must leave (files, dv_state, file_stats) EQUAL to
    the model's state at v — across arbitrary histories including DV
    attachments and re-adds — and a `clone` at v must carry all three
    into its own v0. The restore commit itself replays through the
    same checkpointed walk as everything else."""
    from kamiyo_hive_spark.sources.txlog import restore

    root = tempfile.mkdtemp(prefix="txlog_model_r_")
    clroot = tempfile.mkdtemp(prefix="txlog_model_c_")
    try:
        log = TxLog.init(root)
        model = _Model()
        live: list[str] = []
        dead: list[str] = []
        declared: dict = {}  # path -> first-declared stats (immutable)
        n = 0
        for op, seed, with_stats in steps:
            n += 1
            if op == "append" or (op in ("rewrite", "dv") and not live) or (
                op == "readd" and not dead
            ):
                f = _touch(root, f"data/a{n}/p.parquet")
                stats = {f: {"c": [seed % 50, seed % 50 + 5]}} if with_stats else None
                if stats:
                    declared[f] = stats[f]
                log.commit("append", [f], stats=stats)
                model.apply([f], [], stats, None)
                live.append(f)
            elif op == "rewrite":
                victim = live.pop(seed % len(live))
                f = _touch(root, f"data/r{n}/p.parquet")
                stats = {f: {"c": [seed % 50, seed % 50 + 5]}} if with_stats else None
                if stats:
                    declared[f] = stats[f]
                log.commit(
                    "rewrite", adds=[f], removes=[victim],
                    read_version=log.version(), stats=stats,
                )
                model.apply([f], [victim], stats, None)
                dead.append(victim)
                live.append(f)
            elif op == "dv":
                victim = live[seed % len(live)]
                dv = _touch(root, f"data/dv{n}/p.parquet")
                log.commit(
                    "rewrite", adds=[], removes=[],
                    read_version=log.version(), dvs={victim: [dv]},
                )
                model.apply([], [], None, {victim: [dv]})
            else:
                f = dead.pop(seed % len(dead))
                # stats are a pure function of the path's immutable
                # bytes: a re-add may only carry the ORIGINAL stats
                # (restore/clone semantics) or none at all
                stats = (
                    {f: declared[f]} if with_stats and f in declared
                    else None
                )
                log.commit("append", [f], stats=stats)
                model.apply([f], [], stats, None)
                live.append(f)

        latest = log.version()
        target = pick % (latest + 1)

        # clone BEFORE restore mutates the source history
        if model.files(target):
            cl_dir = os.path.join(clroot, "cl")
            cl = log.clone(cl_dir, version=target)
            assert set(cl.snapshot_files()) == model.files(target)
            assert cl.dv_state() == model.dv_state(target)
            assert cl.file_stats() == model.file_stats(target)

        restore(log, target, writer="model-unwind")
        assert set(log.snapshot_files()) == model.files(target)
        assert log.dv_state() == model.dv_state(target)
        # stats for every file of the target snapshot must be back
        got = log.file_stats()
        want = model.file_stats(target)
        assert {f: got.get(f) for f in want} == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(clroot, ignore_errors=True)
