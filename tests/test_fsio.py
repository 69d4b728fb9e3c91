"""Filesystem capability shim (sources/fsio.py): backend selection,
local fallback semantics, exclusive-create CAS, Hadoop parity."""

from __future__ import annotations

import pytest

from asid_v2_data_pipeline_spark.sources.fsio import (
    HadoopFS,
    LocalFS,
    get_fs,
)


def test_no_session_falls_back_to_local(tmp_path):
    fs = get_fs(None, str(tmp_path))
    assert isinstance(fs, LocalFS)
    p = str(tmp_path / "a" / "b.txt")
    fs.write_bytes(p, b"hi", overwrite=True)
    assert fs.read_bytes(p) == b"hi"
    assert fs.exists(p)
    # exclusive create is the CAS primitive
    with pytest.raises(FileExistsError):
        fs.write_bytes(p, b"again", overwrite=False)
    fs.write_bytes(p, b"new", overwrite=True)  # atomic replace
    assert fs.read_bytes(p) == b"new"
    assert fs.rename(p, str(tmp_path / "a" / "c.txt"))
    assert not fs.exists(p)
    assert fs.list_names(str(tmp_path / "a")) == ["c.txt"]
    assert fs.delete(str(tmp_path / "a"), recursive=True)
    assert not fs.exists(str(tmp_path / "a"))


def test_local_fallback_rejects_remote_schemes():
    fs = LocalFS()
    with pytest.raises(NotImplementedError, match="remote schemes"):
        fs.exists("s3a://bucket/key")
    # file: URIs are local and fine
    assert fs.exists("file:///") is True


def test_hadoop_backend_parity_with_local(spark, tmp_path):
    """The Hadoop backend implements the same contract: bytes written
    by one backend read back through the other; exclusive create
    conflicts raise FileExistsError on both."""
    fs = get_fs(spark, str(tmp_path))
    assert isinstance(fs, HadoopFS)
    p = str(tmp_path / "x.json")
    fs.write_bytes(p, b'{"v": 1}', overwrite=False)
    assert LocalFS().read_bytes(p) == b'{"v": 1}'
    with pytest.raises(FileExistsError):
        fs.write_bytes(p, b"dup", overwrite=False)
    LocalFS().write_bytes(p, b'{"v": 2}', overwrite=True)
    assert fs.read_bytes(p) == b'{"v": 2}'  # no stale-checksum failure
    fs.mkdirs(str(tmp_path / "d" / "e"))
    assert fs.list_dir_names(str(tmp_path / "d")) == ["e"]
    assert fs.delete(str(tmp_path / "d"), recursive=True)


def test_exclusive_create_atomic_with_content(tmp_path):
    """write_bytes(overwrite=False) publishes the name atomically WITH
    its bytes (temp + os.link): a loser of the claim race always reads
    the winner's COMPLETE content, never an empty just-created file —
    and the temp never leaks."""
    import os

    from asid_v2_data_pipeline_spark.sources.fsio import LocalFS

    fs = LocalFS()
    p = str(tmp_path / "claims" / "v1.json")
    fs.write_bytes(p, b'{"version": 1}', overwrite=False)
    assert fs.read_bytes(p) == b'{"version": 1}'
    try:
        fs.write_bytes(p, b'{"version": 1, "loser": true}', overwrite=False)
        raise AssertionError("second exclusive create must fail")
    except FileExistsError:
        pass
    # the winner's bytes are untouched and complete after the lost race
    assert fs.read_bytes(p) == b'{"version": 1}'
    leftovers = [n for n in os.listdir(tmp_path / "claims") if ".tmp" in n]
    assert leftovers == []
