"""Checkpoint/resume lifecycle tests (SURVEY.md §5 item (c); FIXTURES.md §5
'Resume': a rebuild after losing some partitions must produce an index
equal to an uninterrupted build, without redoing committed work)."""

import glob
import json
import os
import shutil

import pytest


@pytest.fixture()
def two_indexes(ray_session, tiny_corpus, tmp_path):
    from raysearch.build import build_index

    full = str(tmp_path / "full")
    build_index(tiny_corpus, full, mode="latin", n_partitions=4, wave_size=1)
    return tiny_corpus, full, tmp_path


def _lexicon_rows(index_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT term, df, cf FROM read_parquet('{index_dir}/merged/lexicon.parquet') ORDER BY term"
    ).fetchall()


def _postings_rows(index_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT term, chunk_id, df, first_doc, last_doc, doc_blob, tf_blob "
        f"FROM read_parquet('{index_dir}/merged/postings/*.parquet') ORDER BY term, chunk_id"
    ).fetchall()


def test_resume_after_lost_wave(two_indexes):
    from raysearch.build import build_index

    corpus, full, tmp = two_indexes
    # clone the index dir, destroy one wave + the merged index
    broken = str(tmp / "broken")
    shutil.copytree(full, broken)
    waves = sorted(glob.glob(os.path.join(broken, "waves", "*")))
    assert len(waves) == 4
    shutil.rmtree(waves[2])
    shutil.rmtree(os.path.join(broken, "merged"))
    # record mtimes of surviving waves: resume must not recompute them
    mtimes = {w: os.path.getmtime(w) for w in waves if os.path.isdir(w)}
    build_index(corpus, broken, mode="latin", n_partitions=4, wave_size=1)
    for w, m in mtimes.items():
        assert os.path.getmtime(w) == m, f"committed wave {w} was recomputed"
    assert _lexicon_rows(broken) == _lexicon_rows(full)
    assert _postings_rows(broken) == _postings_rows(full)


def test_crashed_wave_tmp_is_cleaned(two_indexes):
    from raysearch.build import build_index

    corpus, full, tmp = two_indexes
    broken = str(tmp / "crashed")
    shutil.copytree(full, broken)
    # simulate a crash: a wave dir present WITHOUT manifest.json
    waves = sorted(glob.glob(os.path.join(broken, "waves", "*")))
    os.remove(os.path.join(waves[1], "manifest.json"))
    shutil.rmtree(os.path.join(broken, "merged"))
    build_index(corpus, broken, mode="latin", n_partitions=4, wave_size=1)
    assert _postings_rows(broken) == _postings_rows(full)


def test_changed_input_rejected(two_indexes, tmp_path_factory):
    from raysearch.build import build_index
    from raysearch.gen import write_corpus

    _, full, _ = two_indexes
    other = str(tmp_path_factory.mktemp("corpus2"))
    write_corpus(other, n_convs=10, avg_turns=5, n_files=2)
    with pytest.raises(ValueError, match="file list changed"):
        build_index(other, full, mode="latin")


def test_manifest_lineage(two_indexes):
    _, full, _ = two_indexes
    for mpath in glob.glob(os.path.join(full, "waves", "*", "manifest.json")):
        with open(mpath) as f:
            m = json.load(f)
        assert m["wall_s"] >= 0
        for pid, st in m["per_partition"].items():
            assert st["files"], pid  # lineage: input fragments recorded
            assert st["n_docs"] > 0 and st["n_postings"] > 0


def test_rebuild_partition_restores_index(two_indexes):
    """§3.3 analog: evict one partition, rebuild, byte-equal index."""
    from raysearch.build import rebuild_partition

    corpus, full, tmp = two_indexes
    redo = str(tmp / "redo")
    shutil.copytree(full, redo)
    meta = rebuild_partition(corpus, redo, partition_id=2)
    assert meta["n_docs"] > 0
    assert _lexicon_rows(redo) == _lexicon_rows(full)
    assert _postings_rows(redo) == _postings_rows(full)


def test_rebuild_partition_by_conv_id(two_indexes):
    from raysearch.build import partition_of, rebuild_partition
    from raysearch.gen import conv_name

    corpus, full, tmp = two_indexes
    redo = str(tmp / "redo_conv")
    shutil.copytree(full, redo)
    pid = partition_of(redo, conv_name(7))
    assert 0 <= pid < 4
    rebuild_partition(corpus, redo, conv_id=conv_name(7))
    assert _postings_rows(redo) == _postings_rows(full)


def test_evict_drops_partition_rows(two_indexes):
    import duckdb

    from raysearch.build import _committed_partitions, evict_partition

    corpus, full, tmp = two_indexes
    broken = str(tmp / "evicted")
    shutil.copytree(full, broken)
    evict_partition(broken, 1)
    pids, _ = _committed_partitions(broken)
    assert 1 not in pids
    segs = glob.glob(os.path.join(broken, "waves", "*", "segments", "*.parquet"))
    if segs:
        rows = duckdb.sql(
            f"SELECT count(*) FROM read_parquet({segs!r}) WHERE partition_id = 1"
        ).fetchone()
        assert rows[0] == 0


def test_merge_resumes_from_partial_tmp(two_indexes):
    """A crashed merge leaves _tmp_merged with some atomic bucket
    files; resume must keep them (same wave set) and only produce the
    missing buckets."""
    import time

    from raysearch.build import build_index

    corpus, full, tmp = two_indexes
    broken = str(tmp / "merge_crash")
    shutil.copytree(full, broken)
    # simulate the crash: merged/ becomes the in-progress _tmp_merged
    # with half its bucket files missing
    os.rename(os.path.join(broken, "merged"), os.path.join(broken, "_tmp_merged"))
    os.remove(os.path.join(broken, "_tmp_merged", "meta.json"))
    bucket_files = sorted(
        glob.glob(os.path.join(broken, "_tmp_merged", "postings", "*.parquet"))
    )
    assert len(bucket_files) > 2
    for f in bucket_files[::2]:
        os.remove(f)
    survivors = {
        f: os.path.getmtime(f) for f in bucket_files if os.path.exists(f)
    }
    time.sleep(0.05)
    build_index(corpus, broken, mode="latin", n_partitions=4, wave_size=1)
    for f, m in survivors.items():
        final = f.replace("_tmp_merged", "merged")
        assert os.path.getmtime(final) == m, "completed bucket was redone"
    assert _postings_rows(broken) == _postings_rows(full)
    assert _lexicon_rows(broken) == _lexicon_rows(full)


def test_pipelines_produce_identical_index(two_indexes):
    """local (partition-task, default), shuffle (groupby), and
    forced-spill local builds must emit byte-identical merged postings."""
    from raysearch.build import build_index

    corpus, full, tmp = two_indexes  # `full` was built with the default
    for name, kw in (
        ("shuffle", {"pipeline": "shuffle"}),
        # small read batches + tiny spill budget force MULTIPLE flushes
        # per partition (mid-stream sub-segments + final flush)
        ("spill", {"pipeline": "local", "spill_rows": 200, "read_batch_rows": 8}),
    ):
        out = str(tmp / f"pipe_{name}")
        build_index(corpus, out, mode="latin", n_partitions=4, **kw)
        assert _postings_rows(out) == _postings_rows(full), name
        assert _lexicon_rows(out) == _lexicon_rows(full), name
        if name == "spill":
            for mpath in glob.glob(os.path.join(out, "waves", "*", "manifest.json")):
                with open(mpath) as f:
                    m = json.load(f)
                assert all(
                    p["n_flushes"] > 1 for p in m["per_partition"].values()
                ), "spill did not produce multiple sub-segments"


def test_merge_skipped_when_up_to_date(two_indexes):
    from raysearch.build import build_index

    corpus, full, _ = two_indexes
    mtime = max(
        os.path.getmtime(p)
        for p in glob.glob(os.path.join(full, "merged", "postings", "*.parquet"))
    )
    build_index(corpus, full, mode="latin")  # no-op resume
    mtime2 = max(
        os.path.getmtime(p)
        for p in glob.glob(os.path.join(full, "merged", "postings", "*.parquet"))
    )
    assert mtime == mtime2


def test_sigterm_midbuild_then_resume(ray_session, tiny_corpus, tmp_path):
    """Kill a REAL build process mid-run (the serve stopIndexing path:
    SIGTERM, not a simulated missing wave), then resume: committed
    waves must survive untouched and the final index must equal an
    uninterrupted build's."""
    import subprocess
    import sys
    import time

    from raysearch.build import build_index

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "killed")
    p = subprocess.Popen(
        [
            sys.executable, "-m", "raysearch", "--num-cpus", "4", "build",
            "--input", tiny_corpus, "--out", out,
            "--partitions", "4", "--wave-size", "1",
        ],
        cwd=repo,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if glob.glob(os.path.join(out, "waves", "*", "manifest.json")):
            break
        if p.poll() is not None:
            break
        time.sleep(0.2)
    interrupted = p.poll() is None
    p.terminate()
    p.wait(timeout=60)

    committed = {
        w: os.path.getmtime(w)
        for w in glob.glob(os.path.join(out, "waves", "*"))
        if os.path.isfile(os.path.join(w, "manifest.json"))
    }
    # resume in-process; committed waves must not be recomputed
    build_index(tiny_corpus, out, mode="latin", n_partitions=4, wave_size=1)
    for w, m in committed.items():
        assert os.path.getmtime(w) == m, f"committed wave {w} recomputed"

    clean = str(tmp_path / "clean")
    build_index(tiny_corpus, clean, mode="latin", n_partitions=4, wave_size=1)
    assert _lexicon_rows(out) == _lexicon_rows(clean)
    assert _postings_rows(out) == _postings_rows(clean)
    assert interrupted or committed, "build finished before any commit"
