"""DSIR-style data selection via importance resampling.

Implements the hashed n-gram importance-weighting scheme of
"Data Selection for Language Models via Importance Resampling"
(Xie, Santurkar, Ma, Liang — NeurIPS 2023, arXiv:2302.03169): featurize
every document as a bag of hashed unigrams+bigrams over ``B`` buckets,
fit two smoothed bag-of-buckets models — one on a TARGET slice (here the
``lang = 'en'`` documents, standing in for the paper's high-quality
exemplar corpus) and one on the RAW corpus — and score each raw document
by its log importance weight  Σ_grams [log p_target(b) − log p_raw(b)].
Selection takes the top-k weights (the deterministic analog of the
paper's Gumbel-top-k resampling).

Scale posture (100 TB): two streaming passes over the corpus.  Pass 1 is
a ``map_batches`` partial bincount per block followed by a groupby that
is bounded by ``B`` rows (B ≈ 10⁴ in the paper) — never corpus-sized.
The λ table (B int64s) is broadcast into pass 2, which is a pure
streaming ``map_batches``; selection is per-block partial top-k, so the
driver only ever sees k·n_blocks candidate rows.

SQL replayability: weights are quantized to integer micro-nats
(λ_b = round(1e6·log-ratio), one ``ln`` per bucket — parity with DuckDB
verified bitwise for the integer-count arguments this pipeline produces),
so per-document weights are exact order-free int64 sums and the whole
pipeline — tokenize → bigram → md5 bucket → count → λ → Σ → top-k —
replays in DuckDB.  The md5 gram hash exists for the oracle; swap
``md5=False`` for the vectorized xxh64 fold on the scale path (same
shapes, no SQL twin).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import xxh64_batch
from ..functions.sketches import md5_u64_batch

DSIR_B = 1024  # feature buckets; the paper uses ~10k at full corpus scale
DSIR_SCALE = 1_000_000  # micro-nat quantization of the per-bucket log-ratio
DSIR_K = 50  # top-k selection size exposed by dsir_select


def gram_buckets(texts, B: int = DSIR_B, md5: bool = True) -> tuple[np.ndarray, np.ndarray, int]:
    """Hashed unigram+bigram buckets: (bucket int64 flat, doc idx int64
    flat, n_docs).  Tokens are lowercased ``\\s+`` splits with empties
    dropped (the house tokenization the fingerprint/vocab oracles already
    replay); a bigram's preimage is ``tok[i] + ' ' + tok[i+1]`` so DuckDB
    rebuilds the identical string with ``t[i] || ' ' || t[i+1]``."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n = len(arr)
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc = doc[mask]
    if not mask.any():
        return np.empty(0, np.int64), np.empty(0, np.int64), n
    t_arr = flat.filter(pa.array(mask))
    if isinstance(t_arr, pa.ChunkedArray):
        t_arr = t_arr.combine_chunks()
    hash_fn = md5_u64_batch if md5 else xxh64_batch
    uni_h = hash_fn(t_arr)
    valid = np.roll(doc, -1) == doc
    if len(valid):
        valid[-1] = False
    if valid.any():
        # bigram preimages stay in Arrow end-to-end: take the (i, i+1)
        # token pairs and join with ' ' via binary_join_element_wise —
        # byte-identical to DuckDB's t[i] || ' ' || t[i+1] rebuild, no
        # per-token Python objects on either the md5 or the xxh64 path
        idx = np.flatnonzero(valid)
        left = t_arr.take(pa.array(idx))
        right = t_arr.take(pa.array(idx + 1))
        bi_pa = pc.binary_join_element_wise(left, right, " ")
        bi_h = hash_fn(bi_pa)
        h = np.concatenate([uni_h, bi_h])
        d = np.concatenate([doc, doc[valid]])
    else:
        h, d = uni_h, doc
    return (h % np.uint64(B)).astype(np.int64), d, n


def _bucket_counts(ds, B: int, target_col: str, target_val: str, md5: bool) -> tuple[np.ndarray, np.ndarray]:
    """Pass 1: (target_counts[B], raw_counts[B]) int64.  Per-block partial
    bincounts → a groupby bounded by B rows → driver collect (B-sized)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        bkt, doc, _ = gram_buckets(b.column("text"), B, md5=md5)
        nr = np.bincount(bkt, minlength=B).astype(np.int64)
        is_t = pc.equal(b.column(target_col), target_val).to_numpy(zero_copy_only=False)
        if len(bkt):
            tm = is_t[doc]
            nt = np.bincount(bkt[tm], minlength=B).astype(np.int64)
        else:
            nt = np.zeros(B, np.int64)
        nz = np.flatnonzero(nr)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "nt": pa.array(nt[nz], pa.int64()),
                "nr": pa.array(nr[nz], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("b").aggregate(Sum("nt"), Sum("nr"))
    ct = np.zeros(B, np.int64)
    cr = np.zeros(B, np.int64)
    for t in agg.iter_batches(batch_format="pyarrow"):
        bi = t.column("b").to_numpy(zero_copy_only=False)
        ct[bi] = t.column("sum(nt)").to_numpy(zero_copy_only=False)
        cr[bi] = t.column("sum(nr)").to_numpy(zero_copy_only=False)
    return ct, cr


def dsir_lambda(ct: np.ndarray, cr: np.ndarray, B: int) -> np.ndarray:
    """Quantized per-bucket log importance ratio, int64 micro-nats:
    λ_b = round(1e6·(((ln(ct_b+1) − ln(Tt+B)) − ln(cr_b+1)) + ln(Tr+B))),
    add-one smoothing, round half AWAY FROM ZERO — DuckDB's round(); the
    expression tree mirrors the oracle's left-associative SQL exactly so
    both sides quantize the same float64."""
    tt, tr = int(ct.sum()), int(cr.sum())
    lam = np.zeros(B, np.int64)
    log_tt, log_tr = math.log(tt + B), math.log(tr + B)
    for bkt in range(B):
        x = ((math.log(int(ct[bkt]) + 1) - log_tt) - math.log(int(cr[bkt]) + 1)) + log_tr
        x *= DSIR_SCALE
        lam[bkt] = int(math.copysign(math.floor(abs(x) + 0.5), x))
    return lam


def dsir_weights_ds(sf_dir: str, B: int = DSIR_B, md5: bool = True):
    """(doc_id, weight_unats int64) for every document: the DSIR log
    importance weight in micro-nats.  Docs with no grams weigh 0."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    ct, cr = _bucket_counts(docs, B, "lang", "en", md5)
    lam = dsir_lambda(ct, cr, B)

    def score(b: pa.Table) -> pa.Table:
        bkt, doc, n = gram_buckets(b.column("text"), B, md5=md5)
        w = np.zeros(n, np.int64)
        if len(bkt):
            order = np.argsort(doc, kind="stable")
            d, v = doc[order], lam[bkt[order]]
            starts = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
            w[d[starts]] = np.add.reduceat(v, starts)
        return pa.table({"doc_id": b.column("doc_id"), "weight_unats": pa.array(w, pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")


def q_dsir_weights(sf_dir: str):
    return dsir_weights_ds(sf_dir)


def q_dsir_select(sf_dir: str, k: int = DSIR_K):
    """Top-k most target-like documents by (weight desc, doc_id asc) —
    per-block partial top-k, then a driver merge of ≤ k·n_blocks rows."""
    ds = dsir_weights_ds(sf_dir)

    def topk(b: pa.Table) -> pa.Table:
        w = b.column("weight_unats").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.lexsort((did, -w))[:k]
        return b.take(pa.array(np.sort(keep)))

    cands = ds.map_batches(topk, batch_format="pyarrow")
    parts = list(cands.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts) if parts else pa.table(
        {"doc_id": pa.array([], pa.int64()), "weight_unats": pa.array([], pa.int64())}
    )
    w = t.column("weight_unats").to_numpy(zero_copy_only=False)
    did = t.column("doc_id").to_numpy(zero_copy_only=False)
    keep = np.lexsort((did, -w))[:k]
    return t.take(pa.array(np.sort(keep)))


def _weights_sql(B: int = DSIR_B) -> str:
    return (
        "WITH toks AS (SELECT doc_id, lang, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents), "
        "g1 AS (SELECT doc_id, lang, unnest(t) AS g FROM toks), "
        "g2 AS (SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(t) - 1), "
        "i -> t[i] || ' ' || t[i + 1])) AS g FROM toks), "
        "grams AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2), "
        f"bg AS (SELECT doc_id, lang, CAST(md5_number_upper(g) % {B} AS BIGINT) AS b FROM grams), "
        "cnt AS (SELECT b, count(*) FILTER (lang = 'en') AS nt, count(*) AS nr FROM bg GROUP BY b), "
        "tot AS (SELECT sum(nt) AS tt, sum(nr) AS tr FROM cnt), "
        f"lam AS (SELECT b, CAST(round({DSIR_SCALE} * (((ln(nt + 1) - ln(tt + {B})) - ln(nr + 1)) "
        f"+ ln(tr + {B}))) AS BIGINT) AS lam FROM cnt, tot), "
        "w AS (SELECT bg.doc_id, sum(lam.lam) AS w FROM bg JOIN lam USING (b) GROUP BY bg.doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(w.w, 0) AS BIGINT) AS weight_unats "
        "FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id"
    )


ORACLE_SQL = {
    "dsir_weights": _weights_sql(),
    "dsir_select": (
        f"SELECT doc_id, weight_unats FROM ({_weights_sql()}) "
        f"ORDER BY weight_unats DESC, doc_id LIMIT {DSIR_K}"
    ),
}
