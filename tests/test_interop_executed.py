"""Executed coverage for the Hail interop modules (C14/C15) via a fake Hail.

The real pipelines (interop/mt_to_inputs.py, interop/outputs_to_ht.py) can
only run on a Spark cluster with Hail installed, which this environment
lacks (docs/PARITY.md).  These tests close the gap by injecting a
*semantically real* ``hail`` stub: a MatrixTable backed by a dense NumPy
genotype matrix whose ``entries().to_spark().write.parquet`` writes actual
ZSTD Parquet with the reference COO schema, and a Spark session whose
``read.parquet`` reads actual partitions back with pyarrow.

That lets us execute every line of the interop transform sequence
(reference: mt_to_cuking_inputs.py:14-47, cuking_outputs_to_ht.py:11-16)
and — more importantly — prove the *contract*: the exporter's output
directory feeds the real ingest (planes bit-identical to pack_genotypes),
and the real output writer's partitions round-trip through the importer.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import types

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cuking_tpu.io.metadata import read_metadata
from cuking_tpu.io.parquet_ingest import ingest_parquet
from cuking_tpu.io.uri import Storage
from cuking_tpu.models.king import PanelStorage
from cuking_tpu.ops.bitset import PlaneLayout, pack_genotypes
from cuking_tpu.parallel.submatrix import Submatrix
from cuking_tpu.utils.synthetic import random_genotypes


class _Expr:
    """Marker for a Hail field reference; carries the field name so select()
    can verify the interop code maps the right source field to each output
    column."""

    def __init__(self, name: str):
        self.name = name

    def n_alt_alleles(self):
        assert self.name == "GT", "n_alt_alleles() must be called on mt.GT"
        return _Expr("GT.n_alt_alleles()")


class _Row:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class FakeColsTable:
    """mt.key_cols_by().cols() — collect() deliberately returns the rows in
    scrambled order so the exporter's sort-by-col_idx is load-bearing
    (mt_to_cuking_inputs.py:40-45: list position == col_idx)."""

    def __init__(self, sample_ids: list[str]):
        self._ids = sample_ids

    @property
    def col_idx(self):
        return _Expr("col_idx")

    @property
    def s(self):
        return _Expr("s")

    def select(self, *exprs):
        assert {e.name for e in exprs} == {"col_idx", "s"}
        return self

    def collect(self):
        rows = [_Row(s=s, col_idx=k) for k, s in enumerate(self._ids)]
        rng = np.random.default_rng(7)
        return [rows[k] for k in rng.permutation(len(rows))]


class FakeParquetWriter:
    def __init__(self, coo: pa.Table):
        self._coo = coo
        self.options: dict[str, str] = {}

    def option(self, key: str, value: str):
        self.options[key] = value
        return self

    def parquet(self, uri: str, mode: str = "errorifexists"):
        # Spark semantics: errorifexists refuses a pre-existing path.
        if mode == "errorifexists" and os.path.exists(uri):
            raise FileExistsError(uri)
        assert self.options.get("compression") == "zstd", (
            "the reference exporter writes ZSTD inputs "
            "(mt_to_cuking_inputs.py:31-34)"
        )
        os.makedirs(uri, exist_ok=True)
        # Spark writes one file per partition; emit two to keep the
        # multi-partition listing path honest, plus a _SUCCESS sentinel.
        n = self._coo.num_rows
        for p, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
            pq.write_table(
                self._coo.slice(lo, hi - lo),
                os.path.join(uri, f"part-{p:05d}.zstd.parquet"),
                compression="zstd",
            )
        open(os.path.join(uri, "_SUCCESS"), "w").close()


class FakeSparkDataFrame:
    def __init__(self, coo: pa.Table):
        self._coo = coo

    @property
    def write(self):
        return FakeParquetWriter(self._coo)


class FakeEntriesTable:
    """mt.entries(): the COO long table of *present* genotypes."""

    def __init__(self, coo: pa.Table):
        self._coo = coo
        self._keyed = True

    def __getattr__(self, name):
        if name in ("row_idx", "col_idx", "n_alt_alleles"):
            return _Expr(name)
        raise AttributeError(name)

    def key_by(self, *keys):
        assert not keys, "exporter must unkey the entries table"
        self._keyed = False
        return self

    def select(self, **kw):
        assert not self._keyed
        assert {k: v.name for k, v in kw.items()} == {
            "row_idx": "row_idx",
            "col_idx": "col_idx",
            "n_alt_alleles": "n_alt_alleles",
        }
        return self

    def to_spark(self):
        return FakeSparkDataFrame(self._coo)


class FakeMatrixTable:
    """Dense [sites, samples] genotype matrix (-1 = missing) behind the
    subset of the MatrixTable API the exporter touches.  State flags enforce
    that the exporter performs each required transform before using its
    result."""

    def __init__(self, geno_site_major: np.ndarray, sample_ids: list[str]):
        self._geno = geno_site_major
        self._ids = sample_ids
        self._entries_selected = False
        self._slimmed = set()
        self._row_indexed = False
        self._col_indexed = False

    @property
    def GT(self):
        assert not self._entries_selected, "GT was dropped by select_entries"
        return _Expr("GT")

    def select_entries(self, **kw):
        assert list(kw) == ["n_alt_alleles"]
        assert kw["n_alt_alleles"].name == "GT.n_alt_alleles()"
        self._entries_selected = True
        return self

    def select_globals(self, *a):
        assert not a
        self._slimmed.add("globals")
        return self

    def select_rows(self, *a):
        assert not a
        self._slimmed.add("rows")
        return self

    def select_cols(self, *a):
        assert not a
        self._slimmed.add("cols")
        return self

    def add_row_index(self, name: str = "row_idx"):
        assert name == "row_idx"
        self._row_indexed = True
        return self

    def add_col_index(self, name: str = "col_idx"):
        assert name == "col_idx"
        self._col_indexed = True
        return self

    def entries(self):
        assert self._entries_selected and self._row_indexed and self._col_indexed
        assert self._slimmed == {"globals", "rows", "cols"}, (
            "row/col/global fields must be dropped before entries() or the "
            "COO table grows extra columns"
        )
        site_idx, samp_idx = np.nonzero(self._geno >= 0)
        coo = pa.Table.from_arrays(
            [
                pa.array(site_idx, type=pa.int64()),
                pa.array(samp_idx, type=pa.int64()),
                pa.array(self._geno[site_idx, samp_idx], type=pa.int32()),
            ],
            names=["row_idx", "col_idx", "n_alt_alleles"],
        )
        return FakeEntriesTable(coo)

    def key_cols_by(self, *keys):
        assert not keys
        return self

    def cols(self):
        return FakeColsTable(self._ids)

    def count_rows(self):
        return self._geno.shape[0]


class FakeSparkSession:
    """spark.read.parquet(pattern) over real local partitions via pyarrow."""

    @property
    def read(self):
        return self

    def parquet(self, pattern: str):
        files = sorted(glob.glob(pattern))
        assert files, f"no partitions match {pattern}"
        return pa.concat_tables([pq.read_table(f) for f in files])


class FakeHailTable:
    def __init__(self, table: pa.Table):
        self.table = table
        self.key = None

    def __getattr__(self, name):
        if name in self.table.column_names:
            return _Expr(name)
        raise AttributeError(name)

    def key_by(self, *exprs):
        self.key = tuple(e.name for e in exprs)
        return self


def _install_fake_hail(monkeypatch, mt: FakeMatrixTable | None = None):
    hl = types.ModuleType("hail")
    hl.hadoop_open = open
    hl.init = lambda **kw: None
    hl.read_matrix_table = lambda uri: mt
    table_ns = types.SimpleNamespace(from_spark=lambda df: FakeHailTable(df))
    hl.Table = table_ns
    env = types.SimpleNamespace(spark_session=lambda: FakeSparkSession())
    hl.utils = types.SimpleNamespace(java=types.SimpleNamespace(Env=env))
    monkeypatch.setitem(sys.modules, "hail", hl)
    return hl


def test_mt_to_inputs_feeds_real_ingest(tmp_path, monkeypatch):
    """mt_to_cuking_inputs executes end-to-end and its output directory
    satisfies the engine's input contract bit-exactly."""
    from cuking_tpu.interop.mt_to_inputs import mt_to_cuking_inputs

    g = random_genotypes(17, 230, missing_rate=0.15, seed=11)  # [samples, sites]
    ids = [f"HG{k:05d}" for k in range(17)]
    mt = FakeMatrixTable(np.ascontiguousarray(g.T), ids)
    _install_fake_hail(monkeypatch)

    input_uri = str(tmp_path / "in.parquet")
    mt_to_cuking_inputs(mt, input_uri, overwrite=False)

    # Re-export without overwrite must refuse; with overwrite must succeed.
    mt2 = FakeMatrixTable(np.ascontiguousarray(g.T), ids)
    with pytest.raises(FileExistsError):
        mt_to_cuking_inputs(mt2, input_uri, overwrite=False)
    mt3 = FakeMatrixTable(np.ascontiguousarray(g.T), ids)
    mt_to_cuking_inputs(mt3, input_uri, overwrite=True)

    # metadata.json: num_sites + samples ordered by col_idx despite the
    # scrambled collect() (mt_to_cuking_inputs.py:40-47).
    with open(os.path.join(input_uri, "metadata.json")) as f:
        md_json = json.load(f)
    assert md_json == {"num_sites": 230, "samples": ids}

    # The written directory drives the REAL ingest path.
    storage = Storage()
    md = read_metadata(storage, input_uri)
    layout = PlaneLayout.create(md.num_sites, words_multiple=32)
    sm = Submatrix.create(md.num_samples, 1, 0)
    ps = PanelStorage(layout, sm, panel=8)
    ingest_parquet(
        storage, storage.list_parquet_files(input_uri), ps,
        num_reader_threads=2, use_native=False,
    )
    assert np.array_equal(ps.planes[:, : md.num_samples], pack_genotypes(g, layout))


def test_mt_to_inputs_cli_main(tmp_path, monkeypatch, capsys):
    """The module's __main__ path: flag parsing + hl.init + read_matrix_table."""
    from cuking_tpu.interop import mt_to_inputs

    g = random_genotypes(5, 40, missing_rate=0.1, seed=3)
    mt = FakeMatrixTable(np.ascontiguousarray(g.T), [f"S{k}" for k in range(5)])
    _install_fake_hail(monkeypatch, mt)

    out = str(tmp_path / "exported.parquet")
    rc = mt_to_inputs.main(["--mt-uri", "gs://fake/cohort.mt", "--parquet-uri", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "metadata.json"))
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 2


def test_outputs_to_ht_round_trips_real_partitions(tmp_path, monkeypatch):
    """cuking_outputs_to_ht reads the real writer's partitions and keys by
    (i, j) — the reference import path (cuking_outputs_to_ht.py:11-16)."""
    from cuking_tpu.interop.outputs_to_ht import cuking_outputs_to_ht
    from cuking_tpu.io.writer import write_results
    from cuking_tpu.models.king import ResultSet

    _install_fake_hail(monkeypatch)

    results = ResultSet(
        i_idx=np.array([0, 1], dtype=np.int32),
        j_idx=np.array([2, 3], dtype=np.int32),
        kin=np.array([0.25, 0.125], dtype=np.float32),
        ibs0=np.array([3, 9], dtype=np.int32),
        ibs1=np.array([4, 8], dtype=np.int32),
        ibs2=np.array([5, 7], dtype=np.int32),
    )
    ids = ["A", "B", "C", "D"]
    out_uri = str(tmp_path / "out.parquet")
    os.makedirs(out_uri)
    write_results(Storage(), out_uri, results, ids, shard_index=0)

    ht = cuking_outputs_to_ht(out_uri)
    assert ht.key == ("i", "j")
    got = ht.table.to_pydict()
    assert got["i"] == ["A", "B"]
    assert got["j"] == ["C", "D"]
    assert got["kin"] == pytest.approx([0.25, 0.125])
    assert got["ibs0"] == [3, 9]
