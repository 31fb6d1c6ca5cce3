"""Non-parquet source/sink coverage: JSONL and CSV round-trips.

The reference's sinks are parquet/CSV-ish exports (app/exporters and the
playlist writer, SURVEY §2.6 W1/W3); Ray Data gives JSONL/CSV natively.
Each round-trip query WRITES the documents metadata through the format
and READS it back — the SQL oracle reads the original parquet, so the
driver's value-hash certifies the format path is lossless end to end
(types included: ints stay ints, strings stay strings).

Sinks write to a per-(sf, format) scratch dir under /tmp, partitioned by
Ray's block structure (resumable-output discipline: many files, never
one giant file); reads stream back through the normal Dataset scan.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

import ray

_COLS = ["doc_id", "lang", "source", "n_chars"]


def _scratch(sf_dir: str, fmt: str) -> str:
    # keyed on the FULL path so two dirs sharing a basename never collide
    import hashlib

    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/fscrawler_formats/{tag}/{fmt}"


def _roundtrip(sf_dir: str, fmt: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=_COLS)
    out = _scratch(sf_dir, fmt)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    if fmt == "jsonl":
        ds.write_json(out)
        back = ray.data.read_json(out)
    elif fmt == "csv":
        ds.write_csv(out)
        back = ray.data.read_csv(out)
    elif fmt == "hive":
        # hive-partitioned parquet: the partition column round-trips
        # through the column→directory→column encoding
        ds.write_parquet(out, partition_cols=["lang"])
        back = ray.data.read_parquet(out)
    else:
        raise ValueError(fmt)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "lang": b.column("lang").cast(pa.string()),
                "source": b.column("source").cast(pa.string()),
                "n_chars": b.column("n_chars").cast(pa.int64()),
            }
        )

    # collect NOW (metadata-only columns, test-scale-sized): a lazy handle
    # over the mutable scratch dir would read whatever a LATER round-trip
    # wrote there (the crawl_rollup shared-dir discipline)
    batches = list(
        back.map_batches(project, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    if not batches:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(batches)


def q_docs_hive_roundtrip(sf_dir: str):
    """Hive-partitioned parquet round-trip (the brief's 'write partitioned
    Parquet, one directory per key' resumable-output discipline):
    partition values must survive the column→directory→column trip,
    dtype included."""
    return _roundtrip(sf_dir, "hive")


def q_docs_jsonl_roundtrip(sf_dir: str):
    return _roundtrip(sf_dir, "jsonl")


def q_docs_csv_roundtrip(sf_dir: str):
    return _roundtrip(sf_dir, "csv")


ORACLE_SQL = {
    # identity through the format: the oracle reads the ORIGINAL parquet
    "docs_jsonl_roundtrip": "SELECT doc_id, lang, source, n_chars FROM documents",
    "docs_csv_roundtrip": "SELECT doc_id, lang, source, n_chars FROM documents",
    "docs_hive_roundtrip": "SELECT doc_id, lang, source, n_chars FROM documents",
}


def q_docs_jsonl_gz_roundtrip(sf_dir: str):
    """Gzipped-JSONL round-trip — the de-facto web-corpus interchange
    format (CommonCrawl/C4-style dumps ship as .json.gz): shards are
    written TASK-side with stdlib gzip+json (one file per block — the
    many-files resumable-output discipline), read back one task per
    shard, and the TEXT column rides along so JSON escaping is certified
    lossless (the metadata-only trips above don't exercise it)."""
    import glob
    import gzip
    import json
    import uuid

    cols = _COLS + ["text"]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    out = _scratch(sf_dir, "jsonlgz")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        path = os.path.join(out, f"part-{uuid.uuid4().hex}.jsonl.gz")
        with gzip.open(path, "wt", encoding="utf-8") as f:
            for row in b.to_pylist():
                f.write(json.dumps(row) + "\n")
        return pa.table({"path": pa.array([path]), "rows": pa.array([b.num_rows], pa.int64())})

    for _ in ds.map_batches(write_block, batch_format="pyarrow").iter_batches():
        pass  # consume = the export

    files = sorted(glob.glob(os.path.join(out, "*.jsonl.gz")))
    if not files:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    flist = ray.data.from_arrow(pa.table({"path": pa.array(files)})).repartition(len(files))

    def load(b: pa.Table) -> pa.Table:
        rows = []
        for p in b.column("path").to_pylist():
            with gzip.open(p, "rt", encoding="utf-8") as f:
                rows.extend(json.loads(line) for line in f)
        return pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
                "source": pa.array([r["source"] for r in rows], pa.string()),
                "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
            }
        )

    back = flist.map_batches(load, batch_format="pyarrow", batch_size=1)
    batches = list(back.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches)


ORACLE_SQL["docs_jsonl_gz_roundtrip"] = (
    "SELECT doc_id, lang, source, n_chars, text FROM documents"
)
