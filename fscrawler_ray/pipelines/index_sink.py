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
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return index_docs(docs, index_dir, n_partitions)


def index_docs(docs, index_dir: str, n_partitions: int = 16) -> int:
    """Write postings for a (doc_id, text) Dataset into ``index_dir`` —
    the shared insert path of the full build and incremental updates."""
    os.makedirs(index_dir, exist_ok=True)

    def write_postings(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), lens)
        t = pa.table({"token": flat, "doc_id": pa.array(doc_ids)}).filter(keep)
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        # token position within the doc's kept-token sequence (positional
        # postings → phrase queries): each doc's tokens are contiguous in
        # the flat order, so position = running index minus segment start
        kd = t.column("doc_id").to_numpy(zero_copy_only=False)
        seg = np.ones(len(kd), dtype=bool)
        seg[1:] = kd[1:] != kd[:-1]
        starts = np.flatnonzero(seg)
        counts = np.diff(np.append(starts, len(kd)))
        pos = (np.arange(len(kd)) - np.repeat(starts, counts)).astype(np.int32)
        t = t.append_column("pos", pa.array(pos))
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
        t = pa.concat_tables([pq.read_table(f) for f in files])
        keys = [("token", "ascending"), ("doc_id", "ascending"), ("pos", "ascending")]
        # a pre-positional (legacy) index has no pos column; still compactable
        t = t.sort_by([k for k in keys if k[0] in t.column_names])
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(pdir, "compacted-000000.parquet"))
        for f in files:
            if not os.path.basename(f).startswith("compacted-"):
                os.remove(f)
        return 1

    done = ray.get([_compact.remote(os.path.join(index_dir, d)) for d in parts])
    return sum(done)


def update_index(index_dir: str, changed_docs, deleted_ids) -> int:
    """Incremental index maintenance — the delete+reinsert cycle a search
    sink runs when a re-crawl changes or removes documents (the realized
    W5 Elasticsearch-analog update path; reference sketch
    app/elastic_search_client.py:1-37 only ever inserted).

    Phase 1 drops every posting of changed-or-deleted doc_ids: one task
    per partition filters its part files against the broadcast id set
    (ids are delta-sized, postings are corpus-sized — the set rides
    ``ray.put``, the postings never leave their partition). Phase 2
    re-inserts the changed docs through the shared ``index_docs`` path.
    Returns the number of posting rows inserted."""
    import numpy as np

    changed_tbl = changed_docs.select_columns(["doc_id"]).to_pandas()  # delta-sized
    drop = np.unique(
        np.concatenate(
            [
                changed_tbl["doc_id"].to_numpy().astype(np.int64),
                np.asarray(sorted(deleted_ids), dtype=np.int64),
            ]
        )
    )
    drop_ref = ray.put(drop)
    parts = sorted(
        d
        for d in os.listdir(index_dir)
        if d.startswith("term_bucket=") and os.path.isdir(os.path.join(index_dir, d))
    )

    @ray.remote
    def _drop(pdir: str) -> int:
        import pyarrow.parquet as pq

        ids = ray.get(drop_ref)
        removed = 0
        for f in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
            t = pq.read_table(f)
            doc = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, doc)
            pos[pos == len(ids)] = 0
            hit = ids[pos] == doc
            if not hit.any():
                continue
            removed += int(hit.sum())
            kept = t.filter(pa.array(~hit))
            tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(kept, tmp)
            os.replace(tmp, f)
        return removed

    ray.get([_drop.remote(os.path.join(index_dir, d)) for d in parts])
    with open(os.path.join(index_dir, "_meta")) as f:
        n_partitions = int(f.read().strip())
    return index_docs(changed_docs, index_dir, n_partitions)


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


def lookup_postings(index_dir: str, term: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, positions) for one term — the positional posting list;
    reads exactly one partition like :func:`lookup_term`."""
    import pyarrow.parquet as pq

    pdir = _partition_of(index_dir, term)
    ids: list[np.ndarray] = []
    pos: list[np.ndarray] = []
    for f in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
        if "pos" not in pq.read_schema(f).names:
            raise ValueError(
                f"index at {index_dir!r} was built without positions "
                "(pre-positional layout); rebuild with build_inverted_index "
                "to enable phrase queries"
            )
        t = pq.read_table(f, columns=["token", "doc_id", "pos"])
        hit = t.filter(pc.equal(t.column("token"), term.lower()))
        if hit.num_rows:
            ids.append(hit.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64))
            pos.append(hit.column("pos").to_numpy(zero_copy_only=False).astype(np.int64))
    if not ids:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ids), np.concatenate(pos)


def phrase_search(index_dir: str, phrase: str) -> np.ndarray:
    """Docs containing the phrase's tokens at ADJACENT positions — the
    positional-index upgrade over boolean :func:`search`. Vectorized
    adjacency join: term i's postings are packed as ``doc<<32 | (pos-i)``
    keys, so a doc matches iff one packed key survives every term's
    intersection. Reads one partition per phrase term, never the corpus.
    Requires non-negative doc ids (packing invariant, asserted)."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        return np.empty(0, np.int64)
    cur: np.ndarray | None = None
    for i, term in enumerate(terms):
        d, p = lookup_postings(index_dir, term)
        if len(d):
            assert d.min() >= 0, "phrase_search requires non-negative doc ids"
        m = p >= i
        keys = (d[m].astype(np.uint64) << np.uint64(32)) | (p[m] - i).astype(np.uint64)
        cur = np.unique(keys) if cur is None else np.intersect1d(cur, keys)
        if len(cur) == 0:
            return np.empty(0, np.int64)
    return np.unique((cur >> np.uint64(32)).astype(np.int64))


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


# incremental-update edit spec (deterministic, SQL-replayable):
# doc_id % 23 == 0 deleted; doc_id % 17 == 0 (not deleted) re-crawled with
# text 'updated <lang> <doc_id % 7>'
INCR_DEL_MOD = 23
INCR_CHG_MOD = 17


def q_index_incremental_df(sf_dir: str, index_dir: str, min_df: int = 50):
    """Incremental-index certification: full build → delete + re-insert a
    deterministic delta through ``update_index`` → compact → document
    frequencies read back FROM THE ON-DISK POSTINGS.  The oracle computes
    df directly from the edited corpus, so a posting leaked from a deleted
    doc, a stale posting of a changed doc, or a missed re-insert all
    break the hash."""
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    build_inverted_index(sf_dir, index_dir)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def deleted_part(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[ids % INCR_DEL_MOD == 0], pa.int64())})

    deleted = [
        i
        for b in docs.map_batches(deleted_part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        for i in b.column("doc_id").to_pylist()
    ]  # delta-sized (a mass delete would rebuild instead)

    def changed_part(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % INCR_CHG_MOD == 0) & (ids % INCR_DEL_MOD != 0)
        t = b.filter(pa.array(keep))
        rem = t.column("doc_id").to_numpy(zero_copy_only=False) % 7
        text = pc.binary_join_element_wise(
            pa.scalar("updated"),
            t.column("lang"),
            pa.array(rem.astype("U"), pa.string()),
            " ",
        )
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    changed = docs.map_batches(changed_part, batch_format="pyarrow")
    update_index(index_dir, changed, deleted)
    compact_index(index_dir)
    files = sorted(glob.glob(os.path.join(index_dir, "term_bucket=*", "*.parquet")))
    postings = ray.data.read_parquet(files, columns=["token", "doc_id"])
    distinct = postings.groupby(["token", "doc_id"]).count()
    df = distinct.groupby("token").count()

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["token", "df"])
        return b.filter(pc.greater_equal(b.column("df"), min_df))

    return df.map_batches(finish, batch_format="pyarrow")


KEYWORDS_K = 3  # keywords per document


def q_doc_keywords(sf_dir: str, k: int = KEYWORDS_K):
    """Per-document keyword extraction: the top-k tokens of every doc by
    tf-idf (score = tf · ln(N/df), micro-quantized so ranking is pure
    integer+string ordering), tie-broken by token.  The distributed shape
    is ONE vocab-bounded df groupby whose (token → idf) table broadcasts
    into a single streaming pass — a document's tokens live entirely in
    its own row, so per-block top-k IS the final per-doc top-k (no second
    shuffle).  The reference's keyword extractor (P4,
    app/processors/metadata_extractor/keywords_extractor.py) splits
    names into tags; this is its corpus-statistics upgrade."""
    import math

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    N = docs.count()

    def pairs(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), lens)
        return pa.table({"token": flat, "doc_id": pa.array(doc_ids)}).filter(keep)

    # df per token: (token, doc) dedup then count — vocab-bounded output
    df_tbl = (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .count()
        .groupby("token")
        .count()
    )
    toks: list[str] = []
    dfs: list[int] = []
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        toks.extend(b.column("token").to_pylist())
        dfs.extend(b.column("count()").to_pylist())
    vocab = pa.array(toks, pa.string())
    # math.log == libm == DuckDB's std::log on the same double N/df
    idf = np.array([math.log(N / d) for d in dfs], np.float64)

    def topk(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        local = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        ft = flat.filter(keep)
        if isinstance(ft, pa.ChunkedArray):
            ft = ft.combine_chunks()
        local = local[keep.to_numpy(zero_copy_only=False)]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "score_micro": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
        if len(ft) == 0:
            return empty
        pos = pc.index_in(ft, value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        key = local * len(toks) + pos
        ukey, tf = np.unique(key, return_counts=True)
        udoc, upos = ukey // len(toks), ukey % len(toks)
        score = np.floor(tf.astype(np.float64) * idf[upos] * 1_000_000.0 + 0.5).astype(np.int64)
        utok = np.asarray(vocab.take(pa.array(upos)).to_pylist(), dtype=object)
        order = np.lexsort((utok, -score, udoc))
        sd = udoc[order]
        first = np.r_[True, sd[1:] != sd[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(len(sd)), 0))
        rnk = np.arange(len(sd)) - grp_start + 1
        m = rnk <= k
        sel = order[m]
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[udoc[sel]], pa.int64()),
                "token": pa.array(utok[sel].tolist(), pa.string()),
                "score_micro": pa.array(score[sel], pa.int64()),
                "rnk": pa.array(rnk[m], pa.int64()),
            }
        )

    return docs.map_batches(topk, batch_format="pyarrow")


def _default_index_dir(sf_dir: str) -> str:
    """Parameter-keyed /tmp index dir (the IVF pattern, similarity.py):
    keyed on source path+size+mtime so a changed corpus rebuilds and a
    repeated query reuses."""
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.sha1(f"{os.path.realpath(src)}:{st.st_size}:{st.st_mtime_ns}:v2pos".encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "fscrawler_ray_invidx", tag)


def ensure_index(sf_dir: str, n_partitions: int = 16) -> str:
    """Build-once positional index for ``sf_dir`` (crash-safe: built into
    a tmp dir, atomically renamed; the ``_meta`` file marks completion)."""
    import shutil
    import tempfile

    d = _default_index_dir(sf_dir)
    if os.path.exists(os.path.join(d, "_meta")):
        return d
    parent = os.path.dirname(d)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".build-", dir=parent)
    try:
        build_inverted_index(sf_dir, tmp, n_partitions=n_partitions)
        compact_index(tmp)
        try:
            os.rename(tmp, d)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent builder won
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return d


PHRASE = "hash join"  # non-degenerate at every sf (24/27/278 docs)


def q_phrase_hits(sf_dir: str) -> pa.Table:
    """Phrase query through the positional inverted index, SQL-CHECKED:
    the DuckDB oracle finds the same docs with an adjacency regex over the
    raw text (both sides tokenize with RE2 ``\\W`` semantics)."""
    d = ensure_index(sf_dir)
    return pa.table({"doc_id": pa.array(np.sort(phrase_search(d, PHRASE)), pa.int64())})


RANK_TERMS = ("hash", "join", "merge")  # ranked-retrieval demo query
RANK_K = 20


def q_tfidf_topk(sf_dir: str, terms: tuple = RANK_TERMS, k: int = RANK_K):
    """Ranked retrieval (the search sink's scoring view): top-k docs by
    summed tf·idf over the query terms, with an INTEGER-SCALED idf
    (``idf_milli = (N*1000) // df``) so the score is exact integer
    arithmetic on both the Ray and DuckDB sides — no libm/last-ulp drift
    in the hash-strict oracle compare.

    Ray-first shape: the per-batch tokenizer FILTERS to the query terms
    before anything shuffles (corpus-sized input, query-sized shuffle);
    tf is one grouped count; df falls out of the tf stream as a ≤|terms|-
    row aggregate; the broadcast-scored per-doc sums go through one more
    small groupby and a top-k sort — the driver only ever sees k rows
    (plus the |terms|-row df table)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, no scan
    term_set = pa.array(sorted(terms), pa.string())

    def term_rows(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), lens)
        t = pa.table({"token": flat, "doc_id": pa.array(doc_ids)}).filter(keep)
        return t.filter(pc.is_in(t.column("token"), value_set=term_set))

    tf_ds = (
        docs.map_batches(term_rows, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .count()
        .materialize()  # query-sized; consumed by df AND the scoring pass
    )
    df = tf_ds.groupby("token").count().to_pandas()  # ≤ |terms| rows
    if len(df) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())})
    idf_milli = {t: (n_docs * 1000) // int(d) for t, d in zip(df["token"], df["count()"])}

    def weigh(b: pa.Table) -> pa.Table:
        w = b.column("count()").to_numpy(zero_copy_only=False).astype(np.int64) * np.array(
            [idf_milli[t] for t in b.column("token").to_pylist()], dtype=np.int64
        )
        return pa.table({"doc_id": b.column("doc_id"), "w": pa.array(w, pa.int64())})

    scores = tf_ds.map_batches(weigh, batch_format="pyarrow").groupby("doc_id").sum("w")
    top = scores.sort(["sum(w)", "doc_id"], descending=[True, False]).limit(k).to_pandas()
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"].astype(np.int64), pa.int64()),
            "score": pa.array(top["sum(w)"].astype(np.int64), pa.int64()),
        }
    )



def q_bm25_scores(sf_dir: str, terms: tuple = RANK_TERMS):
    """BM25 scoring (Robertson idf, k1=1.2, b=0.75) for every document
    matching any query term — the length-normalized upgrade of
    ``q_tfidf_topk``'s scoring view.  Emits the full candidate score set
    (order-insensitive) so the oracle compare never rides a float
    ranking boundary; production retrieval composes this with the same
    distributed sort+limit the tf·idf query demonstrates.

    Scale shape (three streaming passes over a column-pruned read, no
    corpus-sized driver state):
      1. tf: tokenizer filters to the query terms per batch → a
         query-sized (token, doc_id, tf) groupby; df falls out as a
         ≤|terms|-row aggregate.
      2. global token count: per-batch length partials → one scalar sum
         (avgdl's numerator) — nothing materializes.
      3. doc lengths: the materialized query-sized tf table BROADCASTS
         through the auto join front door into the (doc_id, len) stream,
         so lengths for exactly the candidate docs come back — the
         corpus-sized length table never lands anywhere.
    The float formula is written identically on both engines (same IEEE
    op order); only ln() and the ≤|terms|-addend sums can drift, both
    orders of magnitude inside the checker's 1e-12 rtol."""
    import math

    from ..stages.joins import join as _join

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, no scan
    term_set = pa.array(sorted(terms), pa.string())
    k1, b_ = 1.2, 0.75

    def term_rows(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), lens)
        t = pa.table({"token": flat, "doc_id": pa.array(doc_ids)}).filter(keep)
        return t.filter(pc.is_in(t.column("token"), value_set=term_set))

    tf_ds = (
        docs.map_batches(term_rows, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .count()
        .materialize()  # query-sized; sized → the join planner broadcasts it
    )
    df = tf_ds.groupby("token").count().to_pandas()  # ≤ |terms| rows
    empty = pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
    if len(df) == 0:
        return empty
    idf = {
        t: math.log((n_docs - int(d) + 0.5) / (int(d) + 0.5) + 1.0)
        for t, d in zip(df["token"], df["count()"])
    }

    def len_rows(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        rows = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        kept = np.bincount(rows[keep.to_numpy(zero_copy_only=False)], minlength=b.num_rows)
        return pa.table({"doc_id": b.column("doc_id"), "len": pa.array(kept.astype(np.int64))})

    doclen = docs.map_batches(len_rows, batch_format="pyarrow")
    total_len = doclen.sum("len")  # streaming scalar aggregate (pass 2)
    avgdl = float(total_len) / float(n_docs)

    # pass 3: candidate doc lengths via broadcast of the query-sized tf table
    cand = _join(docs.map_batches(len_rows, batch_format="pyarrow"), tf_ds, on="doc_id", how="inner")

    def weigh(t: pa.Table) -> pa.Table:
        tf = t.column("count()").to_numpy(zero_copy_only=False).astype(np.float64)
        ln = t.column("len").to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.array([idf[tok] for tok in t.column("token").to_pylist()], dtype=np.float64)
        score = w * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b_) + b_ * (ln / avgdl)))
        return pa.table({"doc_id": t.column("doc_id"), "s": pa.array(score, pa.float64())})

    out = cand.map_batches(weigh, batch_format="pyarrow").groupby("doc_id").sum("s").to_pandas()
    if len(out) == 0:
        return empty
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].astype(np.int64), pa.int64()),
            "score": pa.array(out["sum(s)"].astype(np.float64), pa.float64()),
        }
    )


def q_bm25_topk(sf_dir: str, terms: tuple = RANK_TERMS, k: int = 10):
    """BM25 retrieval top-k with a DETERMINISTIC ranking contract: scores
    quantize to integer MICROS (floor(score·10⁶ + ½)) and rank by
    (score_micro DESC, doc_id) — the quantized integer IS the spec, so
    the k-boundary never rides a float ulp (the lesson of r03-session-4's
    full-set bm25_scores, now upgraded to an actual top-k).  Candidate
    scoring reuses q_bm25_scores' three streaming passes; the sort runs
    over the candidate-sized score table."""
    t = q_bm25_scores(sf_dir, terms=terms)
    s = t.column("score").to_numpy(zero_copy_only=False)
    micros = np.floor(s * 1e6 + 0.5).astype(np.int64)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -micros))[:k]
    return pa.table(
        {"doc_id": pa.array(ids[order], pa.int64()), "score_micro": pa.array(micros[order], pa.int64())}
    )


ORACLE_SQL = {
    "doc_keywords": (
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS token "
        "FROM documents), "
        "kt AS (SELECT doc_id, token FROM toks WHERE token <> ''), "
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM kt GROUP BY doc_id, token), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM kt GROUP BY token), "
        "n AS (SELECT count(*) AS nn FROM documents), "
        "s AS (SELECT tf.doc_id, tf.token, "
        "CAST(floor(tf * ln(nn / df) * 1000000 + 0.5) AS BIGINT) AS score_micro "
        "FROM tf JOIN df USING (token), n), "
        "r AS (SELECT doc_id, token, score_micro, ROW_NUMBER() OVER ("
        "PARTITION BY doc_id ORDER BY score_micro DESC, token) AS rnk FROM s) "
        "SELECT doc_id, token, score_micro, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3"
    ),
    "bm25_topk": (
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS tok "
        "FROM documents), "
        "kt AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM kt "
        "WHERE tok IN ('hash', 'join', 'merge') GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok), "
        "n AS (SELECT count(*) AS nn, (SELECT count(*) FROM kt)::DOUBLE / count(*) AS avgdl FROM documents), "
        "lens AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len FROM kt GROUP BY doc_id), "
        "scores AS (SELECT tf.doc_id, sum(ln((nn - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 "
        "/ (tf + 1.2 * (0.25 + 0.75 * (len / avgdl)))) AS score "
        "FROM tf JOIN df USING (tok) JOIN lens USING (doc_id), n GROUP BY tf.doc_id) "
        "SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro "
        "FROM scores ORDER BY score_micro DESC, doc_id LIMIT 10"
    ),
    "bm25_scores": (
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS tok "
        "FROM documents), "
        "kt AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM kt "
        "WHERE tok IN ('hash', 'join', 'merge') GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok), "
        "n AS (SELECT count(*) AS nn, (SELECT count(*) FROM kt)::DOUBLE / count(*) AS avgdl FROM documents), "
        "lens AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len FROM kt GROUP BY doc_id) "
        "SELECT tf.doc_id, sum(ln((nn - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 "
        "/ (tf + 1.2 * (0.25 + 0.75 * (len / avgdl)))) AS score "
        "FROM tf JOIN df USING (tok) JOIN lens USING (doc_id), n GROUP BY tf.doc_id"
    ),

    "tfidf_topk": (
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS tok "
        "FROM documents), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks "
        "WHERE tok IN ('hash', 'join', 'merge') GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok), "
        "n AS (SELECT count(*) AS nn FROM documents) "
        "SELECT doc_id, CAST(sum(tf * ((nn * 1000) // df)) AS BIGINT) AS score "
        "FROM tf JOIN df USING (tok), n GROUP BY doc_id "
        "ORDER BY score DESC, doc_id LIMIT 20"
    ),
    "phrase_hits": (
        "SELECT doc_id FROM documents WHERE regexp_matches(lower(text), "
        "'(^|[^0-9a-z_])hash[^0-9a-z_]+join([^0-9a-z_]|$)') ORDER BY doc_id"
    ),
    "term_df": (
        "SELECT token, cast(count(DISTINCT doc_id) AS BIGINT) AS df FROM ("
        "SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS token FROM documents"
        ") WHERE token <> '' GROUP BY token HAVING count(DISTINCT doc_id) >= 50"
    ),
    "index_incremental_df": (
        "WITH edited AS (SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN "
        "'updated ' || lang || ' ' || CAST(doc_id % 7 AS VARCHAR) ELSE text END AS text "
        "FROM documents WHERE doc_id % 23 <> 0) "
        "SELECT token, cast(count(DISTINCT doc_id) AS BIGINT) AS df FROM ("
        "SELECT doc_id, unnest(string_split_regex(lower(text), '\\W+')) AS token FROM edited"
        ") WHERE token <> '' GROUP BY token HAVING count(DISTINCT doc_id) >= 50"
    ),
}


def _hybrid_sql(k: int = 10, oversample: int = 4, alpha: float = 0.5) -> str:
    """DuckDB replay of q_hybrid_search: the bm25_topk CTE (widened to the
    oversampled shortlist), the have-an-embedding filter, per-vector unit
    normalization, the Rocchio top-3 centroid, cosine-to-centroid and the
    min-max blend — rnk output only, so the 1e-16 libm sum-order drift in
    the dense floats cannot surface unless two blends tie to ~1e-15."""
    short = ORACLE_SQL["bm25_topk"].replace("LIMIT 10", f"LIMIT {k * oversample}")
    return (
        f"WITH short AS ({short}), "
        "sr AS (SELECT doc_id, score_micro, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS lexrank FROM short), "
        "se AS (SELECT sr.doc_id, sr.score_micro, sr.lexrank, e.embedding "
        "FROM sr JOIN embeddings e ON e.vec_id = sr.doc_id), "
        "sv AS (SELECT *, row_number() OVER (ORDER BY lexrank) AS r2 FROM se), "
        "dims AS (SELECT doc_id, r2, i, embedding[i] AS x "
        "FROM sv, unnest(generate_series(1, len(embedding))) AS s(i)), "
        "nrm AS (SELECT doc_id, sqrt(sum(x * x)) AS nv FROM dims GROUP BY doc_id), "
        "und AS (SELECT d.doc_id, d.r2, d.i, d.x / n.nv AS u FROM dims d JOIN nrm n USING (doc_id)), "
        "cent AS (SELECT i, avg(u) AS c FROM und WHERE r2 <= 3 GROUP BY i), "
        "cn AS (SELECT sqrt(sum(c * c)) AS nc FROM cent), "
        "dense AS (SELECT u.doc_id, sum(u.u * (cent.c / cn.nc)) AS dns "
        "FROM und u JOIN cent USING (i), cn GROUP BY u.doc_id), "
        "mm AS (SELECT min(score_micro) AS lo, max(score_micro) AS hi FROM sv), "
        "blend AS (SELECT sv.doc_id, "
        f"{alpha} * (CASE WHEN mm.hi > mm.lo THEN (sv.score_micro - mm.lo)::DOUBLE / (mm.hi - mm.lo) ELSE 0.0 END) "
        f"+ {1 - alpha} * dense.dns AS b "
        "FROM sv JOIN dense USING (doc_id), mm) "
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY b DESC, doc_id) AS BIGINT) AS rnk FROM blend "
        f"ORDER BY b DESC, doc_id LIMIT {k}"
    )


def q_hybrid_search(sf_dir: str, terms: tuple = RANK_TERMS, k: int = 10, oversample: int = 4, alpha: float = 0.5):
    """Two-stage hybrid retrieval (the production BM25→dense pattern with
    Rocchio pseudo-relevance feedback): the quantized BM25 top-(k·o)
    shortlist fetches its embeddings through ONE vec_id-pushdown read,
    the top-3 lexical hits define the dense query centroid, and the final
    rank blends min-max-normalized BM25 with cosine-to-centroid
    (alpha·lex + (1-alpha)·dense), ties broken by doc_id.  Everything
    past the streaming BM25 pass is shortlist-sized; approximate/float
    blend → rows-only + pytest."""
    from .similarity import _norm, fetch_vectors

    empty = pa.table({"doc_id": pa.array([], pa.int64()), "rnk": pa.array([], pa.int64())})
    short = q_bm25_topk(sf_dir, terms=terms, k=k * oversample).to_pandas()
    if len(short) == 0:
        return empty
    ids = short["doc_id"].to_numpy(dtype=np.int64)
    pos, vv = fetch_vectors(sf_dir, np.unique(ids))
    have = np.array([i for i, d in enumerate(ids) if int(d) in pos], dtype=np.int64)
    if len(have) == 0:  # no shortlisted doc has an embedding row
        return empty
    ids, bm = ids[have], short["score_micro"].to_numpy(dtype=np.float64)[have]
    emb = vv[[pos[int(d)] for d in ids]]
    centroid = _norm(emb[: min(3, len(emb))].mean(axis=0, keepdims=True))[0]  # Rocchio PRF
    dense = emb @ centroid
    span = bm.max() - bm.min()
    lex = (bm - bm.min()) / span if span > 0 else np.zeros_like(bm)
    blend = alpha * lex + (1 - alpha) * dense
    order = np.lexsort((ids, -blend))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "rnk": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        }
    )


ORACLE_SQL["hybrid_search"] = _hybrid_sql()


def q_postings_varint(sf_dir: str, range_width: int = 512):
    """Delta + varint postings compression sizing (the Lucene/ES
    storage model for the W5-analog index): per term, the d-gap list of
    its sorted doc_ids is costed at vbyte rates (1 byte per 7 payload
    bits) and compared against the raw 8-byte encoding.

    Scale posture: the per-term gap scan never forms one df-sized group
    — postings are bucketed by (term, doc_id // range_width) and each
    bucket computes its local gap cost + (min, max, count) partials; a
    second pass groups the bucket PARTIALS per term (bounded by the
    doc-id range / range_width, not by df), adding the boundary gaps
    between consecutive buckets and the leading gap (= first doc_id).
    A 10^9-doc stopword posting therefore costs 10^9/range_width partial
    rows, never a single group.  SQL oracle: one lag() window replay."""
    import pandas as pd

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        doc_ids = np.repeat(
            b.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False), lens
        )
        return pa.table({"term": flat, "doc_id": pa.array(doc_ids)}).filter(keep)

    distinct = (
        docs.map_batches(pairs, batch_format="pyarrow").groupby(["term", "doc_id"]).count()
    )

    def add_rng(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").cast(pa.int64())
        return pa.table(
            {"term": b.column("term"), "doc_id": d, "rng": pc.divide(d, range_width)}
        )

    bucketed = distinct.map_batches(add_rng, batch_format="pyarrow")

    def _vbytes(g: np.ndarray) -> np.ndarray:
        return np.select(
            [g < 128, g < 16384, g < 2097152, g < 268435456], [1, 2, 3, 4], 5
        ).astype(np.int64)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["doc_id"].to_numpy())
        inner = int(_vbytes(np.diff(d)).sum()) if len(d) > 1 else 0
        return pd.DataFrame(
            {
                "term": [g["term"].iloc[0]],
                "rng": [int(g["rng"].iloc[0])],
                "n": [len(d)],
                "inner_bytes": [inner],
                "min_doc": [int(d[0])],
                "max_doc": [int(d[-1])],
            }
        )

    parts = bucketed.groupby(["term", "rng"]).map_groups(partial, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rng")
        mins = g["min_doc"].to_numpy()
        maxs = g["max_doc"].to_numpy()
        # leading gap = first doc_id; boundary gaps between buckets
        vb = int(_vbytes(np.array([mins[0]])).sum())
        if len(g) > 1:
            vb += int(_vbytes(mins[1:] - maxs[:-1]).sum())
        vb += int(g["inner_bytes"].sum())
        n = int(g["n"].sum())
        return pd.DataFrame(
            {
                "term": [g["term"].iloc[0]],
                "df": [n],
                "varint_bytes": [vb],
                "raw_bytes": [n * 8],
            }
        )

    out = parts.groupby("term").map_groups(finish, batch_format="pandas")

    def cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": b.column("term").cast(pa.string()),
                "df": b.column("df").cast(pa.int64()),
                "varint_bytes": b.column("varint_bytes").cast(pa.int64()),
                "raw_bytes": b.column("raw_bytes").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


ORACLE_SQL["postings_varint"] = (
    "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS term "
    "FROM documents), "
    "d AS (SELECT DISTINCT term, CAST(doc_id AS BIGINT) AS doc_id FROM toks), "
    "g AS (SELECT term, doc_id, doc_id - lag(doc_id) OVER "
    "(PARTITION BY term ORDER BY doc_id) AS gap FROM d), "
    "v AS (SELECT term, CASE WHEN gap IS NULL THEN doc_id ELSE gap END AS gp FROM g), "
    "b AS (SELECT term, CASE WHEN gp < 128 THEN 1 WHEN gp < 16384 THEN 2 "
    "WHEN gp < 2097152 THEN 3 WHEN gp < 268435456 THEN 4 ELSE 5 END AS nb FROM v) "
    "SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(nb) AS BIGINT) AS varint_bytes, "
    "CAST(count(*) * 8 AS BIGINT) AS raw_bytes FROM b GROUP BY term"
)


def q_term_dict_frontcode(sf_dir: str):
    """Front-coded term dictionary sizing (the other half of the Lucene
    storage model beside q_postings_varint): sorted vocabulary terms
    store only (lcp with previous term, suffix), costing
    ``len - lcp + 2`` bytes each vs the raw ``len``.

    The vocabulary is metadata-scale (the BPE word-table boundedness
    argument — millions of terms ≪ corpus size), so after the
    distributed distinct-token groupby the sorted adjacency fold runs
    driver-side fully vectorized (padded byte-matrix compare, cumprod
    prefix mask — no per-char Python loop)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def toks(b: pa.Table) -> pa.Table:
        flat, lens, keep = tokenize(b.column("text"))
        return pa.table({"term": flat}).filter(keep)

    vocab = docs.map_batches(toks, batch_format="pyarrow").groupby("term").count()
    terms = sorted(
        t
        for b in vocab.iter_batches(batch_format="pyarrow")
        for t in b.column("term").to_pylist()
    )
    if not terms:
        e = pa.array([], pa.int64())
        return pa.table(
            {"term": pa.array([], pa.string()), "lcp_prev": e, "raw_bytes": e, "fc_bytes": e}
        )
    enc = [t.encode() for t in terms]
    L = max(len(x) for x in enc)
    m = np.zeros((len(enc), L), dtype=np.uint8)
    for i, x in enumerate(enc):  # vocab-bounded fill
        m[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    lens = np.array([len(x) for x in enc], dtype=np.int64)
    eq = m[1:] == m[:-1]
    lcp = np.concatenate(
        [[0], np.minimum(np.cumprod(eq, axis=1).sum(axis=1), np.minimum(lens[1:], lens[:-1]))]
    ).astype(np.int64)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "lcp_prev": pa.array(lcp),
            "raw_bytes": pa.array(lens),
            "fc_bytes": pa.array(lens - lcp + 2),
        }
    )


ORACLE_SQL["term_dict_frontcode"] = (
    "WITH v AS (SELECT DISTINCT unnest(regexp_extract_all(text, '\\S+')) AS t "
    "FROM documents), "
    "s AS (SELECT t, lag(t) OVER (ORDER BY t) AS p FROM v), "
    "k AS (SELECT t, p, COALESCE((SELECT max(u.i) FROM "
    "(SELECT unnest(generate_series(0, least(length(t), length(p)))) AS i) u "
    "WHERE substr(t, 1, CAST(u.i AS BIGINT)) = substr(p, 1, CAST(u.i AS BIGINT))), 0) "
    "AS lcp FROM s) "
    "SELECT t AS term, CAST(CASE WHEN p IS NULL THEN 0 ELSE lcp END AS BIGINT) AS lcp_prev, "
    "CAST(octet_length(encode(t)) AS BIGINT) AS raw_bytes, "
    "CAST(octet_length(encode(t)) - CASE WHEN p IS NULL THEN 0 ELSE lcp END + 2 AS BIGINT) "
    "AS fc_bytes FROM k"
)
