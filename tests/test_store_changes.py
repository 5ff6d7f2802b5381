"""Store-level pins for the round-5 review findings on time travel /
incremental scan / schema-on-catalog / rollback: each test is a
scenario the first implementation got wrong (silent column loss under
compaction, under-read old side on migrations, archive-gap segment
drop, schema narrowing, abandoned-timeline as_of, empty-bucket point
read)."""

import os

from spider_spark.state.store import SnapshotStore


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_compaction_preserves_evolved_column(spark, tmp_path):
    """An append table that gained a column must keep it through
    compaction: the rollup read runs under the committed schema, not
    one sampled file's."""
    st = SnapshotStore(str(tmp_path / "c"))
    st.commit_round(1, {}, {"log": _df(spark, [(1, "a")], "id long, url string")})
    st.commit_round(2, {}, {"log": _df(
        spark, [(2, "b", 0.5)], "id long, url string, score double")})
    assert st.compact_appends(spark, "log", min_segments=2)
    got = {r["id"]: r["score"] for r in st.read(spark, "log").collect()}
    assert got == {1: None, 2: 0.5}


def test_append_schema_never_narrows(spark, tmp_path):
    """A later narrower append must not hide earlier segments' columns
    (last-writer-wins would, and compaction would then destroy them):
    committed append schemas union."""
    st = SnapshotStore(str(tmp_path / "n"))
    st.commit_round(1, {}, {"log": _df(
        spark, [(1, "a", 0.5)], "id long, url string, score double")})
    st.commit_round(2, {}, {"log": _df(spark, [(2, "b")], "id long, url string")})
    cur = st.read(spark, "log")
    assert set(cur.columns) == {"id", "url", "score"}
    got = {r["id"]: r["score"] for r in cur.collect()}
    assert got == {1: 0.5, 2: None}
    assert st.compact_appends(spark, "log", min_segments=2)
    assert {r["id"]: r["score"] for r in st.read(spark, "log").collect()} \
        == got


def test_read_changes_heals_archive_gap(spark, tmp_path):
    """A crash between the catalog swap and the archive write loses one
    round's archive; its segment must still appear in the delta (the
    successor catalogs' accumulated segment lists name it)."""
    st = SnapshotStore(str(tmp_path / "g"))
    for r in range(1, 5):
        st.commit_round(r, {}, {"log": _df(
            spark, [(r, f"u{r}")], "round long, url string")})
    os.unlink(st._archive_path(3))  # simulate the crash window
    delta = st.read_changes(spark, "log", since=1, as_of=4)
    assert sorted(r["round"] for r in delta.collect()) == [2, 3, 4]


def test_read_changes_shrink_rebucket_is_empty(spark, tmp_path):
    """A bucket-count migration with unchanged contents is an EMPTY
    delta: the old side must read ALL old buckets (a shrink drops
    bucket ids the new modulus never names)."""
    st = SnapshotStore(str(tmp_path / "s"))
    rows = [(i, f"u{i}", i % 4) for i in range(12)]
    st.commit_round(1, {}, {}, bucket_updates={
        "t": (_df(spark, rows, "id long, url string, bucket int"), 4)})
    rows2 = [(i, f"u{i}", i % 2) for i in range(12)]
    st.commit_round(2, {}, {}, bucket_updates={
        "t": (_df(spark, rows2, "id long, url string, bucket int"), 2)},
        rebucket={"t"})
    delta = st.read_changes(spark, "t", since=1, as_of=2)
    assert delta is None or delta.count() == 0


def test_read_changes_rewrite_to_bucketed_migration(spark, tmp_path):
    """A table migrating rewrite→bucketed inside the window diffs the
    new buckets against the ENTIRE old rewrite version — pre-existing
    rows are not re-reported."""
    st = SnapshotStore(str(tmp_path / "m"))
    st.commit_round(1, {"t": _df(spark, [(1, "a"), (2, "b")],
                                 "id long, url string")}, {})
    rows = [(1, "a", 0), (2, "b", 1), (3, "c", 0)]
    st.commit_round(2, {}, {}, bucket_updates={
        "t": (_df(spark, rows, "id long, url string, bucket int"), 2)})
    delta = st.read_changes(spark, "t", since=1, as_of=2)
    assert sorted(r["id"] for r in delta.collect()) == [3]


def test_abandoned_timeline_archives_rejected(spark, tmp_path):
    """Archives beyond the live round (crash inside rollback between
    the swap and the unlink loop) must resolve for NEITHER snapshots()
    NOR read_catalog(as_of) — they are an abandoned timeline whose
    dirs carry no gc grace."""
    st = SnapshotStore(str(tmp_path / "a"))
    for r in range(1, 4):
        st.commit_round(r, {"t": _df(spark, [(r,)], "id long")}, {})
    st.rollback(1)
    # resurrect one abandoned archive, as a mid-rollback crash would
    st._atomic_write_json(st._archive_path(3), {"round": 3, "tables": {},
                                                "appends": {}})
    assert st.snapshots() == [1]
    try:
        st.read_catalog(as_of=3)
        raise AssertionError("abandoned-timeline round must not resolve")
    except KeyError:
        pass


def test_rollback_then_gc_collects_abandoned_dirs(spark, tmp_path):
    """Never-replayed abandoned-timeline dirs past the torn-commit
    window are collectable despite the keep_recent grace (its upper
    bound is current+1)."""
    st = SnapshotStore(str(tmp_path / "rg"), snapshot_keep=8)
    for r in range(1, 5):
        st.commit_round(r, {"t": _df(spark, [(r,)], "id long")}, {})
    st.rollback(1)
    removed = st.gc_orphans(keep_recent=2)
    # rounds 3 and 4 dirs (beyond current+1=2) are gone; round 2's dir
    # keeps the torn-commit grace
    assert "t/snap-000003" in removed and "t/snap-000004" in removed
    assert os.path.isdir(os.path.join(st.root, "t", "snap-000002"))
    assert st.read(spark, "t").count() == 1


def test_read_changes_matches_brute_oracle_over_random_history(spark,
                                                               tmp_path):
    """Property pin for the whole delta surface: over a seeded random
    history of appends, partial bucket rewrites, and a compaction, every
    retained (a, b) pair's read_changes equals the brute
    read(b).exceptAll(read(a)) oracle — for an append table and a
    bucketed table simultaneously."""
    import random
    rng = random.Random(41)
    st = SnapshotStore(str(tmp_path / "h"), snapshot_keep=8)
    nb = 4
    next_id = 0
    for rnd in range(1, 7):
        n_new = rng.randint(1, 5)
        rows = [(next_id + i, f"u{next_id + i}", (next_id + i) % nb,
                 rnd) for i in range(n_new)]
        next_id += n_new
        # partial rewrite: the touched buckets are the new rows' plus
        # re-emitted current rows of one random bucket (an update)
        touched = {r[2] for r in rows} | {rng.randrange(nb)}
        cur = st.read(spark, "t")
        old_rows = []
        if cur is not None:
            old_rows = [(r["id"], r["url"], r["id"] % nb,
                         rnd if rng.random() < 0.5 else r["round"])
                        for r in cur.collect() if r["id"] % nb in touched]
        upd = _df(spark, old_rows + rows,
                  "id long, url string, bucket int, round long")
        st.commit_round(rnd, {}, {"log": _df(
            spark, [(rnd, i) for i in range(rng.randint(1, 3))],
            "round long, k long")}, bucket_updates={"t": (upd, nb)})
        if rnd == 4:
            st.compact_appends(spark, "log", min_segments=2)

    snaps = st.snapshots()
    assert len(snaps) >= 4
    for i, a in enumerate(snaps):
        for b in snaps[i + 1:]:
            for tbl, cols in (("t", ["id", "url", "round"]),
                              ("log", ["round", "k"])):
                delta = st.read_changes(spark, tbl, since=a, as_of=b)
                oracle = st.read(spark, tbl, as_of=b).exceptAll(
                    st.read(spark, tbl, as_of=a))
                got = sorted(tuple(r[c] for c in cols)
                             for r in (delta.collect() if delta is not None
                                       else []))
                want = sorted(tuple(r[c] for c in cols)
                              for r in oracle.collect())
                assert got == want, (tbl, a, b)


def test_concurrent_reader_survives_commits_and_gc(spark, corpus_dir,
                                                   corpus, crawl_config,
                                                   tmp_path):
    """The gc grace window's actual contract: a reader that planned its
    scan against an OLDER catalog (lazy DataFrame, files not yet read)
    still materializes correctly after later rounds commit, compact,
    and gc — within gc_retain_rounds, its files are never deleted out
    from under it."""
    import dataclasses
    from spider_spark.engine import CrawlEngine
    from spider_spark.state.store import SnapshotStore

    cfg = dataclasses.replace(crawl_config, gc_retain_rounds=3,
                              max_append_segments=2)
    eng = CrawlEngine(
        spark, SnapshotStore(str(tmp_path / "cr")),
        corpus_dir + "/documents.parquet", cfg,
        robots=spark.read.parquet(corpus_dir + "/robots.parquet"),
        hosts=spark.read.parquet(corpus_dir + "/hosts.parquet"))
    eng.bootstrap(corpus["seeds"])
    eng.run(2)

    # plan now, materialize later: these frames reference round-2 dirs
    old_frontier = eng.frontier()
    old_postings = eng.postings()
    want_f, want_p = old_frontier.count(), old_postings.count()

    # two more rounds: commits, filter updates, compaction + gc fire
    eng.run(2)
    assert eng.store.current_round == 4

    # the old plans still resolve — same rows as when they were planned
    assert old_frontier.count() == want_f
    assert old_postings.count() == want_p
    # and the old frontier is genuinely stale vs the live one
    assert eng.frontier().count() >= want_f
