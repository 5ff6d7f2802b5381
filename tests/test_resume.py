"""Crash/resume semantics (SURVEY.md §7.5): the catalog swap is the
commit point; a new engine over the same store continues bit-identically
(the NOT_PUSHED→QUEUED analog, LibraryBuffer.java:97-102)."""

import json
import os
import shutil

from spider_spark.engine import CrawlEngine
from spider_spark.state.store import SnapshotStore


def _mk_engine(spark, corpus_dir, crawl_config, root):
    return CrawlEngine(
        spark, SnapshotStore(root), corpus_dir + "/documents.parquet",
        crawl_config,
        robots=spark.read.parquet(corpus_dir + "/robots.parquet"),
        hosts=spark.read.parquet(corpus_dir + "/hosts.parquet"),
    )


def _state_signature(engine):
    frontier = sorted(
        map(tuple, engine.frontier().toPandas().fillna(-1).values.tolist())
    )
    log = sorted(
        map(tuple, engine.crawl_log().toPandas().values.tolist())
    )
    postings = sorted(
        (r["term"], r["doc_id"], r["rel"], tuple(r["positions"]))
        for r in engine.postings().toPandas().to_dict("records")
    )
    return frontier, log, postings


def test_kill_and_resume_bit_identical(spark, corpus_dir, corpus, crawl_config, tmp_path):
    root_a = str(tmp_path / "uninterrupted")
    root_b = str(tmp_path / "resumed")

    eng_a = _mk_engine(spark, corpus_dir, crawl_config, root_a)
    eng_a.bootstrap(corpus["seeds"])
    eng_a.run(4)

    # run 2 rounds, "crash" (drop the engine object), resume with a fresh
    # engine instance over the same store, run 2 more
    eng_b1 = _mk_engine(spark, corpus_dir, crawl_config, root_b)
    eng_b1.bootstrap(corpus["seeds"])
    eng_b1.run(2)
    del eng_b1
    eng_b2 = _mk_engine(spark, corpus_dir, crawl_config, root_b)
    eng_b2.bootstrap(corpus["seeds"])  # must be a no-op on resume
    eng_b2.run(2)

    assert _state_signature(eng_a) == _state_signature(eng_b2)


def test_torn_round_is_invisible(spark, corpus_dir, corpus, crawl_config, tmp_path):
    """Snapshot dirs written without a catalog swap must not be read —
    simulates a crash mid-commit; gc_orphans cleans them."""
    root = str(tmp_path / "torn")
    eng = _mk_engine(spark, corpus_dir, crawl_config, root)
    eng.bootstrap(corpus["seeds"])
    eng.run(2)
    store = eng.store
    cat_before = store.read_catalog()

    # fake a torn write: an orphan snapshot dir with garbage content
    orphan = os.path.join(root, "frontier", "snap-000099")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("torn")

    assert store.read_catalog() == cat_before
    removed = store.gc_orphans()
    assert "frontier/snap-000099" in removed
    assert not os.path.exists(orphan)
    # engine still runs fine afterwards
    eng2 = _mk_engine(spark, corpus_dir, crawl_config, root)
    assert eng2.run_round() >= 0


def test_lineage_records(spark, corpus_dir, corpus, crawl_config, tmp_path):
    root = str(tmp_path / "lineage")
    eng = _mk_engine(spark, corpus_dir, crawl_config, root)
    eng.bootstrap(corpus["seeds"])
    eng.run(2)
    lineage = eng.store.read_catalog()["lineage"]
    rounds = [e["round"] for e in lineage]
    assert rounds == [0, 1, 2]
    for e in lineage:
        assert "next_id" in e["metrics"]
        assert e["metrics"]["fetched"] >= 0


def test_not_pushed_window_visible_and_recovered(spark, corpus_dir, corpus,
                                                 crawl_config, tmp_path):
    """NOT_PUSHED fidelity (VERDICT r2 item 9, db/Status.java:7-11): a
    crash BETWEEN the phase-1 writes and the catalog swap leaves the
    fetched pages in a visible NOT_PUSHED state; replaying the round
    (NOT_PUSHED→QUEUED recovery, LibraryBuffer.java:97-102) closes the
    window bit-identically."""
    root = str(tmp_path / "np")
    eng = _mk_engine(spark, corpus_dir, crawl_config, root)
    eng.bootstrap(corpus["seeds"])
    eng.run(2)

    # crash the next round after phase 1 (all dirs + marker written)
    # but before phase 2 (the catalog swap)
    boom = RuntimeError("crash before catalog swap")
    orig_swap = eng.store._swap_catalog
    eng.store._swap_catalog = lambda cat: (_ for _ in ()).throw(boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        eng.run_round()
    eng.store._swap_catalog = orig_swap

    # the torn round is invisible to the catalog but visible as a
    # NOT_PUSHED status-distribution window
    eng2 = _mk_engine(spark, corpus_dir, crawl_config, root)
    pending = eng2.store.pending_round()
    assert pending is not None and pending["round"] == 3
    counts = {r["status"]: r["n"] for r in eng2.status_counts().collect()}
    assert counts.get("NOT_PUSHED", 0) == pending["metrics"]["fetched"] > 0
    total = sum(counts.values())

    # replay closes the window and matches an uninterrupted run
    eng2.run_round()
    assert eng2.store.pending_round() is None
    counts2 = {r["status"]: r["n"] for r in eng2.status_counts().collect()}
    assert "NOT_PUSHED" not in counts2

    ref = _mk_engine(spark, corpus_dir, crawl_config, str(tmp_path / "np_ref"))
    ref.bootstrap(corpus["seeds"])
    ref.run(3)
    assert _state_signature(eng2) == _state_signature(ref)
    assert sum(counts2.values()) == ref.frontier().count()
    # the window's distribution summed over the PRE-replay frontier
    # (the replayed round then admits new rows on top of `total`)
    assert total <= sum(counts2.values())


def test_time_travel_reads(spark, corpus_dir, corpus, crawl_config, tmp_path):
    """Iceberg-analog snapshot retention: archived round catalogs are
    readable via as_of, their files survive gc for the retention
    window, and pruning keeps the window bounded."""
    import dataclasses
    cfg = dataclasses.replace(crawl_config, gc_retain_rounds=3)
    eng = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "tt"))
    eng.bootstrap(corpus["seeds"])
    store = eng.store
    per_round = {}
    for _ in range(4):
        eng.run_round()
        rnd = store.current_round
        per_round[rnd] = store.read(spark, "frontier").count()

    snaps = store.snapshots()
    assert store.current_round in snaps
    assert len(snaps) <= cfg.gc_retain_rounds
    # archived rounds resolve to their historical contents even after
    # the per-round gc that eng.run_round already triggers
    for rnd in snaps:
        cat = store.read_catalog(as_of=rnd)
        assert cat["round"] == rnd
        if rnd in per_round:
            assert store.read(spark, "frontier", as_of=rnd).count() \
                == per_round[rnd]
    # a pruned round raises with the retained listing
    oldest_pruned = min(per_round) if min(per_round) not in snaps else None
    if oldest_pruned is not None:
        try:
            store.read_catalog(as_of=oldest_pruned)
            raise AssertionError("pruned round should not resolve")
        except KeyError:
            pass
    # historical frontier differs from the live one across rounds
    if len(snaps) >= 2:
        a, b = snaps[0], snaps[-1]
        assert store.read(spark, "frontier", as_of=a).count() \
            <= store.read(spark, "frontier", as_of=b).count()


def test_incremental_reads(spark, corpus_dir, corpus, crawl_config,
                           tmp_path):
    """read_changes (Iceberg incremental-scan analog / LibraryBuffer
    push-delta): append tables prune to the in-window segments, bucketed
    tables diff only rewritten buckets — both checked against the brute
    full-table oracle computed from as_of reads."""
    import dataclasses
    cfg = dataclasses.replace(crawl_config, gc_retain_rounds=4)
    eng = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "inc"))
    eng.bootstrap(corpus["seeds"])
    store = eng.store
    for _ in range(3):
        eng.run_round()
    snaps = store.snapshots()
    assert len(snaps) >= 2
    a, b = snaps[0], snaps[-1]

    # append table (crawl_log carries a round column — a direct oracle)
    delta = store.read_changes(spark, "crawl_log", since=a, as_of=b)
    got = sorted((r["round"], r["url"]) for r in delta.collect())
    full = store.read(spark, "crawl_log", as_of=b)
    want = sorted((r["round"], r["url"]) for r in full.collect()
                  if a < r["round"] <= b)
    assert got == want and got

    # bucketed table (frontier): delta ≡ multiset difference of the two
    # as_of versions (rows added or updated in the window)
    fd = store.read_changes(spark, "frontier", since=a, as_of=b)
    new_full = store.read(spark, "frontier", as_of=b)
    old_full = store.read(spark, "frontier", as_of=a)
    oracle = new_full.exceptAll(old_full)
    cols = sorted(new_full.columns)
    key = lambda r: tuple((r[c] is None, r[c] if r[c] is not None else 0)
                          for c in cols)
    assert sorted(map(key, fd.collect())) == \
        sorted(map(key, oracle.collect()))
    assert fd.count() > 0

    # engine push-delta wrapper (LibraryBuffer push analog): the
    # postings gathered after round a ≡ full@b minus full@a
    pd_ = eng.postings_delta(a)
    p_new = store.read(spark, "postings", as_of=b)
    p_old = store.read(spark, "postings", as_of=a)
    p_oracle = p_new.exceptAll(p_old) if p_old is not None else p_new
    pkey = lambda r: (r["term"], r["doc_id"], tuple(r["positions"]))
    assert sorted(map(pkey, pd_.collect())) == \
        sorted(map(pkey, p_oracle.collect()))

    # no-op window and bad rounds
    assert store.read_changes(spark, "frontier", since=b, as_of=b) is None
    try:
        store.read_changes(spark, "frontier", since=b - 100, as_of=b)
        raise AssertionError("unretained since must raise")
    except KeyError:
        pass


def test_rollback_and_replay_bit_identical(spark, corpus_dir, corpus,
                                           crawl_config, tmp_path):
    """Iceberg rollback_to_snapshot analog: rolling back to a retained
    round and re-running reproduces the uninterrupted timeline
    bit-identically (engine determinism + one-catalog atomicity:
    frontier, postings, crawl log, and filters revert together)."""
    import dataclasses
    cfg = dataclasses.replace(crawl_config, gc_retain_rounds=4)

    eng_a = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "straight"))
    eng_a.bootstrap(corpus["seeds"])
    eng_a.run(4)

    eng_b = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "rolled"))
    eng_b.bootstrap(corpus["seeds"])
    eng_b.run(4)
    before = eng_b.store.current_round
    assert before == eng_a.store.current_round
    # poison-recovery: drop the last two rounds, then replay them
    target = before - 2
    eng_b.rollback(target)
    assert eng_b.store.current_round == target
    assert max(eng_b.store.snapshots()) == target
    assert eng_b.crawl_log().agg({"round": "max"}).first()[0] <= target
    eng_b.run(2)

    assert _state_signature(eng_a) == _state_signature(eng_b)

    # rolling back to a pruned round raises
    try:
        eng_b.rollback(-5)
        raise AssertionError("unretained rollback target must raise")
    except KeyError:
        pass


def test_rollback_crash_resume_composition(spark, corpus_dir, corpus,
                                           crawl_config, tmp_path):
    """The recovery ops compose: rollback, then a torn commit (crash
    between phase-1 writes and the catalog swap), then resume on a
    fresh engine — the final state still matches an uninterrupted run
    bit-for-bit (rollback's replay determinism + the NOT_PUSHED→QUEUED
    replay rule are the same one mechanism: an uncommitted round
    simply runs again)."""
    import dataclasses
    cfg = dataclasses.replace(crawl_config, gc_retain_rounds=4)

    ref = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "ref"))
    ref.bootstrap(corpus["seeds"])
    ref.run(4)

    eng = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "mix"))
    eng.bootstrap(corpus["seeds"])
    eng.run(3)
    eng.rollback(1)            # drop rounds 2-3
    eng.run_round()            # replay round 2

    # torn round 3: phase-1 dirs + marker land, swap "crashes"
    boom = RuntimeError("crash before catalog swap")
    orig = eng.store._swap_catalog
    eng.store._swap_catalog = lambda cat: (_ for _ in ()).throw(boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        eng.run_round()
    eng.store._swap_catalog = orig

    # fresh engine over the same store: replays round 3, runs round 4
    eng2 = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "mix"))
    eng2.bootstrap(corpus["seeds"])  # no-op on resume
    eng2.run(2)
    assert eng2.store.current_round == 4

    assert _state_signature(ref) == _state_signature(eng2)
