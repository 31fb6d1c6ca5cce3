"""Inverted-index sink — the reference's Elasticsearch indexing analog
(W5, /root/reference/app/elastic_search_client.py:1-37 — sketch-only
there; realized here as a Ray-Data-native search index over parquet).

Build: one distributed pass explodes documents into (token, doc_id)
postings and writes them hash-partitioned by token into
``index_dir/term_bucket=K/`` — the same physical-pruning layout as the
IVF index, so a term lookup reads exactly ONE partition (1/P of the
index), never the corpus. Lookup: read the term's partition, filter,
return matching doc ids; multi-term queries intersect/union the posting
sets. Tokenization is shared with the ``term_df`` oracle query
(lowercase, split on non-word runs).
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import xxh64, xxh64_batch


def tokenize(text_col) -> tuple[pa.Array, np.ndarray]:
    """(flat tokens, per-row repeat counts) — lowercase, split on \\W+,
    empty tokens dropped. Matches the DuckDB oracle tokenization."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), r"\W+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    keep = pc.invert(pc.equal(flat, ""))
    return flat, lens, keep


def build_inverted_index(sf_dir: str, index_dir: str, n_partitions: int = 16) -> int:
    """Distributed index build; returns the number of posting rows."""
    os.makedirs(index_dir, exist_ok=True)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def write_postings(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), lens)
        t = pa.table({"token": flat, "doc_id": pa.array(doc_ids)}).filter(keep)
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        bucket = (xxh64_batch(t.column("token").combine_chunks()) % np.uint64(n_partitions)).astype(np.int64)
        t = t.append_column("term_bucket", pa.array(bucket))
        # content-derived part name: a retried Ray task overwrites the same
        # file instead of duplicating postings
        tag = int(xxh64_batch(b.column("doc_id").cast(pa.string()).combine_chunks()).sum() & 0xFFFFFFFFFFFFFFFF)
        for k in np.unique(bucket):
            sub = t.filter(pc.equal(t.column("term_bucket"), int(k)))
            pdir = os.path.join(index_dir, f"term_bucket={int(k)}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(pdir, f"part-{tag:016x}.parquet"))
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    counts = docs.map_batches(write_postings, batch_format="pyarrow")
    total = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b.column("rows")).as_py() or 0)
    with open(os.path.join(index_dir, "_meta"), "w") as f:
        f.write(str(n_partitions))
    return total


def compact_index(index_dir: str) -> int:
    """Merge each partition's write-time part files into ONE token-sorted
    file (distributed: one task per partition). Lookups then read a single
    sorted file per term — the posting-list compaction step of any real
    search index. Returns the number of partitions compacted."""
    parts = sorted(
        d for d in os.listdir(index_dir) if d.startswith("term_bucket=") and os.path.isdir(os.path.join(index_dir, d))
    )

    @ray.remote
    def _compact(pdir: str) -> int:
        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        if len(files) <= 1:
            return 0
        t = pa.concat_tables([pq.read_table(f) for f in files]).sort_by("token")
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(pdir, "compacted-000000.parquet"))
        for f in files:
            if not os.path.basename(f).startswith("compacted-"):
                os.remove(f)
        return 1

    done = ray.get([_compact.remote(os.path.join(index_dir, d)) for d in parts])
    return sum(done)


def _partition_of(index_dir: str, term: str) -> str:
    with open(os.path.join(index_dir, "_meta")) as f:
        n = int(f.read().strip())
    k = xxh64(term.lower()) % n
    return os.path.join(index_dir, f"term_bucket={k}")


def lookup_term(index_dir: str, term: str) -> np.ndarray:
    """Posting list for one term: reads exactly one partition (IO-pruned)."""
    import pyarrow.parquet as pq

    pdir = _partition_of(index_dir, term)
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    ids: list[np.ndarray] = []
    for f in files:
        t = pq.read_table(f, columns=["token", "doc_id"])
        hit = t.filter(pc.equal(t.column("token"), term.lower()))
        if hit.num_rows:
            ids.append(hit.column("doc_id").to_numpy(zero_copy_only=False))
    if not ids:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(ids))


def search(index_dir: str, terms: list[str], mode: str = "and") -> np.ndarray:
    """Multi-term boolean search over posting lists."""
    sets = [lookup_term(index_dir, t) for t in terms]
    if not sets:
        return np.empty(0, np.int64)
    out = sets[0]
    for s in sets[1:]:
        out = np.intersect1d(out, s) if mode == "and" else np.union1d(out, s)
    return out


def q_term_df(sf_dir: str, min_df: int = 50):
    """Document frequency per token (the index statistics view), SQL-checked
    against DuckDB's unnest tokenization."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), lens)
        return pa.table({"token": flat, "doc_id": pa.array(doc_ids)}).filter(keep)

    pairs_ds = docs.map_batches(pairs, batch_format="pyarrow")
    distinct = pairs_ds.groupby(["token", "doc_id"]).count()
    df = distinct.groupby("token").count()

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["token", "df"])
        return b.filter(pc.greater_equal(b.column("df"), min_df))

    return df.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL = {
    "term_df": (
        "SELECT token, cast(count(DISTINCT doc_id) AS BIGINT) AS df FROM ("
        "SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS token FROM documents"
        ") WHERE token <> '' GROUP BY token HAVING count(DISTINCT doc_id) >= 50"
    ),
}
