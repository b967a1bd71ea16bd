"""Timeline unit tests (model: reference TestHoodieActiveTimeline)."""

from hudi_0_10_0_spark.fs import FS
from hudi_0_10_0_spark.timeline import (
    COMMIT,
    DELTA_COMMIT,
    Instant,
    Timeline,
    new_instant_time,
)


def test_instant_time_monotonic():
    times = [new_instant_time() for _ in range(50)]
    assert times == sorted(times)
    assert len(set(times)) == 50


def test_instant_parse_roundtrip():
    i = Instant("20240101010101000", COMMIT)
    assert Instant.parse(i.filename()) == i
    j = Instant("20240101010101000", DELTA_COMMIT, "inflight")
    assert Instant.parse(j.filename()) == j
    assert Instant.parse("garbage.tmp") is None


def test_state_transitions_and_read(spark, tmp_table_path):
    fs = FS(spark, tmp_table_path)
    tl = Timeline(fs, tmp_table_path + "/_hoodie_meta")
    ts = new_instant_time()
    tl.create_requested(ts, COMMIT)
    tl.transition_to_inflight(ts, COMMIT)
    assert [i.timestamp for i in tl.pending()] == [ts]
    tl.transition_to_completed(ts, COMMIT, {"x": 1})
    assert tl.pending() == []
    assert [i.timestamp for i in tl.completed_write_instants()] == [ts]
    assert tl.read_metadata(tl.completed()[0]) == {"x": 1}


def test_archive_moves_old_instants(spark, tmp_table_path):
    fs = FS(spark, tmp_table_path)
    tl = Timeline(fs, tmp_table_path + "/_hoodie_meta")
    for _ in range(12):
        ts = new_instant_time()
        tl.create_requested(ts, COMMIT)
        tl.transition_to_completed(ts, COMMIT, {"t": ts})
    n = tl.archive(keep_min=5, keep_max=10)
    assert n == 7
    assert len(tl.completed_write_instants()) == 5
    archived = tl.archived_instants()
    assert len(archived) == 7
    assert archived[0]["metadata"]["t"] == archived[0]["timestamp"]


def test_archive_crash_between_batch_write_and_deletes(spark, tmp_table_path):
    """A crash after the archive batch lands but before the active
    instant files are deleted must not double-fold instants (duplicate
    deltas in MOR merges), and the next archive run self-heals by
    removing the residual active files without re-serializing them."""
    from hudi_0_10_0_spark.metadata import FileSystemView

    fs = FS(spark, tmp_table_path)
    tl = Timeline(fs, tmp_table_path + "/_hoodie_meta")
    all_ts = []
    for k in range(12):
        ts = new_instant_time()
        all_ts.append(ts)
        tl.create_requested(ts, COMMIT)
        tl.transition_to_completed(
            ts, COMMIT,
            {"write_stats": [{"partition": "p", "file_id": "f0", "log": True,
                              "paths": [f"l{k}"], "rows": 1, "bytes": 1}]},
        )
    # simulate the crash: batch write succeeds, deletes never run
    orig = tl.delete_instant_files
    tl.delete_instant_files = lambda ts, action: None
    n = tl.archive(keep_min=5, keep_max=10)
    tl.delete_instant_files = orig
    assert n == 7
    assert len(tl.completed_write_instants()) == 12  # residuals remain
    assert len(tl.archived_instants()) == 7

    # archived ∪ active folds each instant exactly once
    view = FileSystemView(tl)
    assert [ts for ts, _, _ in view.commits] == all_ts
    logs = view.groups[("p", "f0")].logs
    assert len(logs) == 12  # one per commit, no duplicates

    # next run self-heals: deletes residuals, re-archives nothing extra
    n2 = tl.archive(keep_min=5, keep_max=10)
    assert n2 == 7
    assert len(tl.completed_write_instants()) == 5
    assert len(tl.archived_instants()) == 7
    view2 = FileSystemView(tl)
    assert [ts for ts, _, _ in view2.commits] == all_ts


def test_format_query_instant():
    """HoodieSqlUtils.formatQueryInstant: the three user-facing time
    travel formats normalize to timeline instants; garbage rejected."""
    import pytest

    from hudi_0_10_0_spark.timeline import format_query_instant as f

    # second-granularity inputs are inclusive of the whole second:
    # millis pad with "999" (HoodieInstantTimeGenerator DEFAULT_MILLIS_EXT)
    assert f("2021-07-18 12:30:05") == "20210718123005999"
    assert f("2021-07-18 12:30:05.123") == "20210718123005123"
    assert f("2021-07-18") == "20210718000000000"
    assert f("20210718123005") == "20210718123005999"
    assert f("20210718123005123") == "20210718123005123"
    with pytest.raises(ValueError, match="Unsupported query instant"):
        f("not-an-instant")
    with pytest.raises(ValueError):
        f("18/07/2021")
    with pytest.raises(ValueError):
        f("2021071812300x123")


def test_parse_layout_path_base_containing_data_segment():
    """Code-review r3: a table base path that itself contains '/data/'
    must not shift the manifest's relative-path split."""
    from hudi_0_10_0_spark.operators.write import _parse_layout_path

    got = _parse_layout_path(
        "/srv/data/tbl",
        "file:/srv/data/tbl/data/123/_pp=p0/_fg=f1/part-0.parquet",
    )
    assert got == ("p0", "f1", "data/123/_pp=p0/_fg=f1/part-0.parquet")
    # scheme'd base, triple-slash uri
    got = _parse_layout_path(
        "file:///tmp/tbl",
        "file:///tmp/tbl/data/9/_pp=__empty__/_fg=g/part-1.orc",
    )
    assert got is not None and got[2] == "data/9/_pp=__empty__/_fg=g/part-1.orc"
    # non-data files are ignored
    assert _parse_layout_path("/tmp/tbl", "file:/tmp/tbl/x.crc") is None


def test_create_once_timeline_contract_on_local_fs(spark, tmp_table_path):
    """Code-review r6: Hadoop's local FileSystem.rename silently
    OVERWRITES an existing destination (POSIX rename), so the create-once
    contract of completed instant files must come from
    FS.rename_noreplace (FileContext, no-overwrite option)."""
    from hudi_0_10_0_spark.fs import FS

    fs = FS(spark, tmp_table_path)
    fs.mkdirs(tmp_table_path)
    target = f"{tmp_table_path}/instant.commit"
    fs.write_text(target, "first")

    src = f"{tmp_table_path}/late.tmp"
    fs.write_text(src, "second")
    assert fs.rename_noreplace(src, target) is False
    assert fs.read_text(target) == "first"  # never clobbered

    # write_text_atomic(overwrite=False) refuses an existing target
    import pytest as _pytest

    with _pytest.raises(IOError):
        fs.write_text_atomic(target, "third")
    assert fs.read_text(target) == "first"
    # and succeeds onto a fresh path
    fs.write_text_atomic(f"{tmp_table_path}/fresh.commit", "ok")
    assert fs.read_text(f"{tmp_table_path}/fresh.commit") == "ok"
