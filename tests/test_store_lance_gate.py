"""Lance-backend gate (VERDICT r02 #10): the north rule names Lance as the
table store, but the wheel is absent in this sandbox, so ``sources/store.py``
is import-gated with a parquet fallback. Two layers of insurance:

1. ``test_lance_backend_roundtrip`` runs the REAL lance path end-to-end —
   ``pytest.importorskip`` marks it skipped here, and the day the env gains
   ``lance`` the backend is verified with zero code change.
2. ``test_lance_gate_paths_with_fake_module`` drives the gated branches NOW
   with a minimal in-memory stand-in, so a typo/NameError in the
   lance-only lines cannot sit undetected until the wheel appears.
"""

import numpy as np
import pyarrow as pa

import fscrawler_ray.sources.store as store


def _rows(n: int, start: int = 0) -> pa.Table:
    return pa.table(
        {
            "image_id": pa.array([f"img{i:04d}" for i in range(start, start + n)]),
            "size": pa.array(list(range(start, start + n)), pa.int64()),
        }
    )


def test_lance_backend_roundtrip(tmp_path):
    import pytest

    pytest.importorskip("lance")
    import ray

    uri = str(tmp_path / "tbl.lance")
    store.write_table(_rows(8), uri)
    store.write_table(_rows(8, start=8), uri, mode="append")
    ds = store.dataset(uri, columns=["image_id", "size"])
    got = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert len(got) == 16 and got["size"].tolist() == list(range(16))
    n = store.write_dataset(ray.data.from_arrow(_rows(4, start=16)), uri)
    assert n == 4
    keys = store.existing_key_hashes(uri, ["image_id", "size"])
    assert len(keys) == 20 and keys.dtype == np.uint64


class _FakeLanceDataset:
    def __init__(self, tables):
        self._t = pa.concat_tables(tables)

    def to_table(self, columns=None):
        return self._t.select(columns) if columns else self._t


class _FakeLance:
    """The minimal surface store.py's gated lines touch: write_dataset
    (create/append modes) and dataset(uri).to_table(columns=...)."""

    def __init__(self):
        self.store: dict[str, list[pa.Table]] = {}

    def write_dataset(self, table, uri, mode="create"):
        import os

        if mode == "create":
            self.store[uri] = [table]
        else:
            self.store.setdefault(uri, []).append(table)
        os.makedirs(uri, exist_ok=True)  # store.py probes os.path.exists(uri)

    def dataset(self, uri):
        return _FakeLanceDataset(self.store[uri])


def test_lance_gate_paths_with_fake_module(tmp_path, monkeypatch):
    import ray

    fake = _FakeLance()
    monkeypatch.setattr(store, "lance", fake)
    monkeypatch.setattr(store, "HAVE_LANCE", True)
    assert store.backend() == "lance"

    uri = str(tmp_path / "tbl.lance")
    store.write_table(_rows(8), uri)            # create (uri absent)
    store.write_table(_rows(8, start=8), uri)   # append (uri exists)
    assert sum(t.num_rows for t in fake.store[uri]) == 16

    n = store.write_dataset(ray.data.from_arrow(_rows(4, start=16)), uri)
    assert n == 4 and sum(t.num_rows for t in fake.store[uri]) == 20

    keys = store.existing_key_hashes(uri, ["image_id", "size"])
    assert len(keys) == 20 and keys.dtype == np.uint64
    pairs = store.existing_keys(uri, ["image_id", "size"])
    assert len(pairs) == 20 and tuple(pairs[0]) == ("img0000", 0)
