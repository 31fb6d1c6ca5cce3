"""Deterministic sampling operators for training-data curation.

Corpus assembly at 100 TB needs *reproducible* sampling: the same input
must yield the same sample on every run, across any partitioning, with
no coordination between tasks.  Both operators here key the decision on
a multiplicative integer hash of the row id (Knuth's 2^32/phi constant),
so membership is a pure row-local function — a stateless vectorized
``map_batches`` filter with zero shuffle for the mixture, and a
partial-top-k combiner plus one tiny groupby for the stratified quota.
The hash is exact integer arithmetic, so the SQL oracles reproduce it
bit-for-bit ((id * 2654435761) % 2^32) — both ops are value-checked
against DuckDB, unlike rng-based sampling which could only be checked
statistically.

Reference parity: FsCrawler has no sampler; this is part of the
LLM-training-data extension surface (brief: "the operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

KNUTH32 = 2654435761  # floor(2^32 / golden ratio); odd → bijective mod 2^32
_M32 = np.uint64(0xFFFFFFFF)


def _mix32(ids: np.ndarray) -> np.ndarray:
    """(id * KNUTH32) mod 2^32 — a uniform-ish, SQL-reproducible u32."""
    return (ids.astype(np.uint64) * np.uint64(KNUTH32)) & _M32


def block_group_topk(codes: np.ndarray, sort_keys: tuple, k: int) -> np.ndarray:
    """Row indices of the top-k rows per group within one block — the
    partial-top-k combiner every grouped selection (stratified sampling,
    per-key heavy hitters) pushes below its shuffle.  ``codes`` are int
    group ids; ``sort_keys`` order within a group, least significant
    first (np.lexsort convention).  Returned indices are sorted so
    ``table.take`` preserves block order."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort(tuple(sort_keys) + (codes,))
    cs = codes[order]
    idx = np.arange(n)
    first = np.r_[True, cs[1:] != cs[:-1]]
    grp_start = np.maximum.accumulate(np.where(first, idx, 0))
    return np.sort(order[(idx - grp_start) < k])


def mixture_thresholds(rates: dict[str, float], default_rate: float = 1.0) -> dict:
    """Per-key integer keep-thresholds on the u32 hash (rate → round(rate·2^32)).
    Exported so the SQL oracle embeds the *same* integers."""
    out = {k: int(round(r * (1 << 32))) for k, r in rates.items()}
    out[None] = int(round(default_rate * (1 << 32)))
    return out


def weighted_mixture(ds, rates: dict[str, float], key_col: str = "lang", id_col: str = "doc_id", default_rate: float = 1.0):
    """Deterministic Bernoulli-per-stratum downsampling: keep a row iff
    hash(id) < rate[key]·2^32.  The scale-correct way to rebalance a
    corpus (e.g. cap English at 30%, keep all low-resource languages):
    one streaming filter, no shuffle, no state, retry-idempotent."""
    thr = mixture_thresholds(rates, default_rate)
    default_thr = thr[None]

    def f(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = b.column(key_col).combine_chunks()
        enc = keys.dictionary_encode()
        lut = np.array(
            [thr.get(v, default_thr) for v in enc.dictionary.to_pylist()], dtype=np.uint64
        )
        # null keys get the default threshold; -1 codes are clipped to a
        # real lut slot only when the dictionary is non-empty (an all-null
        # batch has an EMPTY dictionary — nothing to index)
        codes = pa.compute.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        null = codes < 0
        if len(lut):
            per_row = np.where(null, np.uint64(default_thr), lut[np.where(null, 0, codes)])
        else:
            per_row = np.full(len(codes), default_thr, dtype=np.uint64)
        keep = _mix32(ids) < per_row
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, k: int, key_col: str = "lang", id_col: str = "doc_id"):
    """Exact per-stratum quota: the k rows with the smallest hash(id) in
    each key group (ties by id), ranked 1..k — a deterministic
    hash-ordered reservoir.

    Scale shape: a per-block partial top-k combiner prunes the stream to
    ≤ k·keys rows per block BEFORE the shuffle, so the final groupby
    moves k·keys·blocks rows, never the corpus.  Mirrors SQL
    row_number() OVER (PARTITION BY key ORDER BY hash, id) <= k."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select([key_col, id_col])
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        enc = b.column(key_col).combine_chunks().dictionary_encode()
        codes = (
            pa.compute.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = block_group_topk(codes, (ids, _mix32(ids)), k)
        return b.select([key_col, id_col]).take(pa.array(keep))

    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.int64)
        h = _mix32(ids)
        order = np.lexsort((ids, h))[:k]
        out = g.iloc[order].copy()
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[[key_col, id_col, "rnk"]]

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    return pruned.groupby(key_col).map_groups(final, batch_format="pandas")


def uniform_sample(ds, k: int, id_col: str = "doc_id"):
    """Deterministic GLOBAL k-sample: the k rows with the smallest
    multiplicative-hash key (ties by id) — order-statistics selection,
    the one-group degenerate of ``stratified_sample``.  The per-block
    partial top-k prunes every block to ≤ k rows before anything leaves
    the task, so the driver's final selection sees ≤ k·blocks rows,
    never the corpus.  Reproducible across runs, partitionings and
    cluster sizes (hash of the id, no RNG state)."""

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        h = _mix32(ids)
        order = np.lexsort((ids, h))[:k]
        return pa.table({id_col: pa.array(ids[np.sort(order)])})

    got = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    ids = got[id_col].to_numpy().astype(np.int64)
    h = _mix32(ids)
    order = np.lexsort((ids, h))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        }
    )


# --- queries() surface over the documents table ---

MIXTURE_RATES = {"en": 0.9, "fr": 0.5, "de": 0.5, "es": 0.25, "zh": 0.1}
STRATA_K = 40
UNIFORM_K = 64


def q_corpus_mixture(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return weighted_mixture(ds, MIXTURE_RATES)


def q_stratified_sample(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return stratified_sample(ds, STRATA_K)


def q_uniform_sample(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return uniform_sample(ds, UNIFORM_K)


WEIGHTED_K = 8
_TWO64 = 18446744073709551616.0


def weighted_reservoir_by_key(ds, key: str, id_col: str, weight_col: str, k: int):
    """Group-wise weighted sample WITHOUT replacement (Efraimidis-Spirakis
    A-Res): per row, ES key = ln(u) / w where u is a deterministic
    md5-uniform of the row id and w = abs(weight) + 1; the k largest keys
    per group ARE a weighted sample.  Membership is a pure row-local
    function, so the distributed shape is the stratified-sample combiner:
    per-block partial top-k per group, then one final top-k over
    ≤ blocks × groups × k candidate rows.  Deterministic across any
    partitioning; the SQL oracle replays u, the key and the ranking
    bit-exactly (md5_number_upper, +0.5, /2^64, ln and abs are the same
    IEEE-double ops on both sides)."""
    import pyarrow.compute as pc

    from ..functions.sketches import md5_u64_batch

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("ky", pa.array([], pa.float64()))
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        w = np.abs(b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)) + 1.0
        h = md5_u64_batch(pc.cast(b.column(id_col), pa.string()))
        u = (h.astype(np.float64) + 0.5) / _TWO64
        ky = np.log(u) / w
        _, codes = np.unique(np.asarray(b.column(key).to_pylist(), dtype=object), return_inverse=True)
        idx = block_group_topk(codes.astype(np.int64), (ids, -ky), k)
        return b.append_column("ky", pa.array(ky)).take(pa.array(idx, pa.int64()))

    cand = ds.map_batches(part, batch_format="pyarrow")
    parts = [b for b in cand.iter_batches(batch_format="pyarrow") if b.num_rows]
    df = pa.concat_tables(parts).to_pandas()
    df = df.sort_values([key, "ky", id_col], ascending=[True, False, True])
    df = df.groupby(key, sort=True).head(k).copy()
    df["rnk"] = df.groupby(key).cumcount() + 1
    out = df.drop(columns=["ky"]).reset_index(drop=True)
    out["rnk"] = out["rnk"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_weighted_sample(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])
    return weighted_reservoir_by_key(ds, "event_type", "event_id", "value", WEIGHTED_K)


TEMP_ALPHA = 0.7  # temperature for the multilingual rebalancing query


def temperature_mixture(ds, alpha: float = TEMP_ALPHA, key_col: str = "lang", id_col: str = "doc_id"):
    """Temperature-scaled mixture sampling — the standard multilingual
    rebalancing (sample language l proportional to p_l^α, α<1 upweights
    low-resource languages; Conneau & Lample 2019, mT5).  Per-language
    keep-rate r_l = p_l^(α−1) / max_k p_k^(α−1), so the most
    over-represented language is downsampled hardest and the rarest keeps
    rate 1.  Membership is the house deterministic Bernoulli
    (KNUTH32 hash of the row id vs round(r_l·2^32)) — row-local,
    partition-invariant, zero shuffle after one tiny per-language count.
    The SQL oracle recomputes p_l, the pow() ladder and the integer
    threshold with the identical expression tree."""
    from ray.data.aggregate import Count

    counts: dict[str, int] = {}
    for b in ds.groupby(key_col).aggregate(Count()).iter_batches(batch_format="pyarrow"):
        for k, c in zip(b.column(key_col).to_pylist(), b.column("count()").to_pylist()):
            counts[k] = int(c)
    n = sum(counts.values())
    import math

    w = {k: (c / n) ** (alpha - 1.0) for k, c in counts.items()}
    mx = max(w.values())
    # floor(x + 0.5): half-up like DuckDB's round() (Python round bankers)
    thr = {k: int(math.floor(v / mx * 4294967296.0 + 0.5)) for k, v in w.items()}

    def f(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix32(ids)
        t = np.array([thr[k] for k in b.column(key_col).to_pylist()], np.uint64)
        return b.filter(pa.array(h < t))

    return ds.map_batches(f, batch_format="pyarrow")


def q_temperature_mixture(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return temperature_mixture(ds)


EPOCH_SHARDS = 8  # output shards for the epoch shuffle query
_EPOCH_BUCKET_BITS = 8  # 2^8 rank buckets per shard bounds the rank groups
_EPOCH_SEED = "ep1"


def _epoch_keys(ids, seed: str) -> np.ndarray:
    """Deterministic uint64 permutation key per row id: md5 of
    ``seed + '|' + str(id)`` — DuckDB rebuilds the identical preimage with
    ``'seed|' || CAST(id AS VARCHAR)``."""
    import pyarrow.compute as pc

    from ..functions.sketches import md5_u64_batch

    pre = pc.binary_join_element_wise(
        pa.scalar(f"{seed}|"), pc.cast(ids, pa.string()), pa.scalar("")
    )
    return md5_u64_batch(pre)


def epoch_shuffle(ds, n_shards: int = EPOCH_SHARDS, seed: str = _EPOCH_SEED, id_col: str = "doc_id"):
    """Deterministic global epoch shuffle → (id, shard, pos): the training
    staple of writing each epoch as a reproducible random permutation of
    the corpus split into ``n_shards`` reader shards.

    Permutation key = md5(seed|id); shard = key % n_shards (row-local,
    zero shuffle); pos = the row's rank within its shard by (key, id).
    The rank is computed scale-safely in two streaming passes — a
    distributed rank, not a global sort: pass 1 histograms (shard,
    key-top-bits bucket) per block into a groupby bounded by
    n_shards·2^bits rows, whose prefix sums are broadcast as rank
    offsets; pass 2 groups on (shard, bucket) — group size is
    corpus/(n_shards·2^bits), bounded — and emits pos = offset +
    local rank.  Every step is exact integer arithmetic, so the SQL
    oracle replays it with one ROW_NUMBER() window."""
    from ray.data.aggregate import Sum

    bits = _EPOCH_BUCKET_BITS
    shift = np.uint64(64 - bits)

    def hist(b: pa.Table) -> pa.Table:
        key = _epoch_keys(b.column(id_col), seed)
        code = (key % np.uint64(n_shards)) * np.uint64(1 << bits) + (key >> shift)
        cnt = np.bincount(code.astype(np.int64), minlength=n_shards << bits)
        nz = np.flatnonzero(cnt)
        return pa.table({"code": pa.array(nz, pa.int64()), "n": pa.array(cnt[nz], pa.int64())})

    counts = np.zeros(n_shards << bits, np.int64)
    for t in (
        ds.map_batches(hist, batch_format="pyarrow").groupby("code").aggregate(Sum("n"))
    ).iter_batches(batch_format="pyarrow"):
        counts[t.column("code").to_numpy(zero_copy_only=False)] = t.column("sum(n)").to_numpy(
            zero_copy_only=False
        )
    # exclusive prefix sums restart at every shard boundary
    offsets = np.concatenate(
        [np.r_[0, np.cumsum(c[:-1])] for c in counts.reshape(n_shards, 1 << bits)]
    )

    def assign(b: pa.Table) -> pa.Table:
        key = _epoch_keys(b.column(id_col), seed)
        shard = (key % np.uint64(n_shards)).astype(np.int64)
        bucket = (key >> shift).astype(np.int64)
        return pa.table(
            {
                id_col: b.column(id_col),
                "key": pa.array(key, pa.uint64()),
                "shard": pa.array(shard, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def rank(g):
        import pandas as pd

        g = g.sort_values(["key", id_col]).reset_index(drop=True)
        off = offsets[int(g["shard"].iloc[0]) << bits | int(g["bucket"].iloc[0])]
        return pd.DataFrame(
            {
                id_col: g[id_col],
                "shard": g["shard"],
                "pos": np.asarray(off + np.arange(len(g)), np.int64),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["shard", "bucket"])
        .map_groups(rank, batch_format="pandas")
    )


def q_epoch_shuffle(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return epoch_shuffle(ds)


# --- deterministic train/val split + near-dup leakage audit -----------------

SPLIT_SALT = "split-v1"
VAL_PERMILLE = 100  # 10% validation


def split_of_ids(ids) -> "pa.Array":
    """Deterministic salted-hash split assignment: stable across runs,
    partitionings and cluster sizes (pure function of doc_id, no RNG),
    and md5-replayable so the SQL oracle can recompute it.  Changing the
    salt re-rolls the whole split — the versioning mechanism."""
    import pyarrow.compute as pc

    from ..functions.sketches import md5_u64_batch

    keyed = pc.binary_join_element_wise(
        pa.scalar(SPLIT_SALT + ":"), pc.cast(ids, pa.string()), ""
    )
    hv = md5_u64_batch(keyed)
    return pa.array(np.where(hv % 1000 < VAL_PERMILLE, "val", "train"))


def q_split_assign(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"), "split": split_of_ids(b.column("doc_id"))})

    return ds.map_batches(f, batch_format="pyarrow")


def q_split_leakage_audit(sf_dir: str):
    """Cross-split near-duplicate LEAKAGE: exact n-gram Jaccard pairs
    (recall 1.0 by construction — dedup.ngram_jaccard_exact) whose two
    docs land in different splits.  The pre-release check a training-data
    team runs: every row is a validation doc whose near-copy sits in
    train, silently inflating eval scores.  Pairs are output-sized, so
    the split decoration is a vectorized local pass."""
    from .dedup import ngram_jaccard_exact

    pairs = ngram_jaccard_exact(sf_dir)  # pa.Table (doc_a, doc_b, jaccard)
    sa = split_of_ids(pairs.column("doc_a"))
    sb = split_of_ids(pairs.column("doc_b"))
    import pyarrow.compute as pc

    t = pa.table(
        {
            "doc_a": pairs.column("doc_a"),
            "doc_b": pairs.column("doc_b"),
            "split_a": sa,
            "split_b": sb,
            "jaccard": pairs.column("jaccard"),
        }
    )
    return t.filter(pc.invert(pc.equal(t.column("split_a"), t.column("split_b"))))


def _mixture_case_sql() -> str:
    thr = mixture_thresholds(MIXTURE_RATES)
    whens = " ".join(f"WHEN '{kk}' THEN {v}" for kk, v in thr.items() if kk is not None)
    return f"CASE lang {whens} ELSE {thr[None]} END"


def q_split_repair(sf_dir: str):
    """Leakage REPAIR: every val doc participating in a cross-split
    near-dup pair is deterministically moved to train (flipping toward
    train can never create new leakage — train/train pairs are benign).
    Output is the full repaired assignment plus a moved flag; the shape a
    release pipeline applies after split_leakage_audit flags pairs."""
    import pyarrow.compute as pc

    leak = q_split_leakage_audit(sf_dir)
    moved = sorted(
        {
            d
            for d, s in zip(leak.column("doc_a").to_pylist(), leak.column("split_a").to_pylist())
            if s == "val"
        }
        | {
            d
            for d, s in zip(leak.column("doc_b").to_pylist(), leak.column("split_b").to_pylist())
            if s == "val"
        }
    )
    moved_arr = pa.array(moved, pa.int64())  # leak-pair-sized, broadcast
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def f(b: pa.Table) -> pa.Table:
        base = split_of_ids(b.column("doc_id"))
        flip = pc.is_in(b.column("doc_id"), value_set=moved_arr)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "split": pc.if_else(flip, pa.scalar("train"), base),
                "moved": flip.cast(pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


TOKEN_BUDGET = 500_000  # planner target (tokens) at check scale


def q_mixture_token_budget(sf_dir: str):
    """Token-budget mixture PLANNER: given per-lang available whitespace
    tokens and the mixture weights, the integer token target and sampling
    rate per language for a fixed total budget — the sheet a data-mixing
    run is provisioned from.  One distributed grouped sum; the final
    arithmetic is lang-bounded."""
    import pyarrow.compute as pc

    from .analytics import grouped_sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def part(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b.column("lang"),
                "n": pc.count_substring_regex(b.column("text"), r"\S+").cast(pa.int64()),
            }
        )

    avail = grouped_sum(
        ds.map_batches(part, batch_format="pyarrow"), ["lang"], {"n": "avail_tokens"}
    ).to_pandas()  # lang-bounded
    wm = {k: int(v * 1_000_000) for k, v in MIXTURE_RATES.items()}
    langs = avail["lang"].tolist()
    av = [int(x) for x in avail["avail_tokens"].tolist()]
    w = [wm.get(l, 100_000) for l in langs]
    tw = sum(w)
    target = [min(a, TOKEN_BUDGET * x // tw) for a, x in zip(av, w)]
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "avail_tokens": pa.array(av, pa.int64()),
            "target_tokens": pa.array(target, pa.int64()),
            "rate_micro": pa.array(
                [t * 1_000_000 // a if a else 0 for t, a in zip(target, av)], pa.int64()
            ),
        }
    )


def split_case_sql(col: str) -> str:
    """The SQL replay of split_of_ids for an arbitrary id column."""
    return (
        f"CASE WHEN CAST(md5_number_upper('{SPLIT_SALT}:' || CAST({col} AS VARCHAR)) AS HUGEINT) "
        f"% 1000 < {VAL_PERMILLE} THEN 'val' ELSE 'train' END"
    )


SPLIT_CASE_SQL = split_case_sql("doc_id")

_WM_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {int(v * 1_000_000)}" for k, v in MIXTURE_RATES.items())
    + " ELSE 100000 END"
)

ORACLE_SQL = {
    "split_assign": f"SELECT doc_id, {SPLIT_CASE_SQL} AS split FROM documents",
    "mixture_token_budget": (
        "WITH c AS (SELECT lang, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) "
        "AS avail FROM documents GROUP BY lang), "
        f"w AS (SELECT lang, avail, CAST({_WM_CASE} AS BIGINT) AS wm FROM c), "
        "t AS (SELECT lang, avail, wm, (SELECT CAST(sum(wm) AS BIGINT) FROM w) AS tw FROM w) "
        f"SELECT lang, avail AS avail_tokens, "
        f"CAST(least(avail, {TOKEN_BUDGET} * wm // tw) AS BIGINT) AS target_tokens, "
        f"CAST(CASE WHEN avail = 0 THEN 0 ELSE least(avail, {TOKEN_BUDGET} * wm // tw) "
        "* 1000000 // avail END AS BIGINT) AS rate_micro FROM t"
    ),
    "temperature_mixture": (
        "WITH c AS (SELECT lang, count(*) AS cl FROM documents GROUP BY lang), "
        "n AS (SELECT sum(cl) AS nn FROM c), "
        f"w AS (SELECT lang, pow(cl / nn, {TEMP_ALPHA - 1.0!r}) AS wl FROM c, n), "
        "r AS (SELECT lang, CAST(floor(wl / (SELECT max(wl) FROM w) * 4294967296.0 + 0.5) AS UBIGINT) AS thr FROM w) "
        f"SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang) "
        f"WHERE (d.doc_id * {KNUTH32}) % 4294967296 < r.thr"
    ),
    "epoch_decorrelation": (
        "WITH a AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY "
        "md5_number_upper('epoch-1|' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pa "
        "FROM documents), "
        "b AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY "
        "md5_number_upper('epoch-2|' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pb "
        "FROM documents), "
        "d AS (SELECT CAST(a.pa AS BIGINT) - b.pb AS d FROM a JOIN b USING (doc_id)), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(d * d) AS HUGEINT) AS s2 FROM d) "
        "SELECT CAST(n AS BIGINT) AS n, CAST(s2 AS BIGINT) AS sum_d2, "
        "CAST(CASE WHEN n * (n * n - 1) = 0 THEN 1000000 ELSE "
        "(2 * n * (n * n - 1) - 6 * s2) * 1000000 // (n * (n * n - 1)) END AS BIGINT) "
        "AS rho_plus1_micro FROM s"
    ),
    "epoch_shuffle": (
        f"WITH k AS (SELECT doc_id, md5_number_upper('{_EPOCH_SEED}|' || CAST(doc_id AS VARCHAR)) AS key "
        "FROM documents) "
        f"SELECT doc_id, CAST(key % {EPOCH_SHARDS} AS BIGINT) AS shard, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY key % {EPOCH_SHARDS} ORDER BY key, doc_id) - 1 AS BIGINT) AS pos "
        "FROM k"
    ),
    "corpus_mixture": (
        "SELECT doc_id, lang FROM documents "
        f"WHERE (doc_id * {KNUTH32}) % 4294967296 < {_mixture_case_sql()}"
    ),
    "uniform_sample": (
        "WITH ranked AS (SELECT doc_id, row_number() OVER ("
        f"ORDER BY (doc_id * {KNUTH32}) % 4294967296, doc_id) AS rnk FROM documents) "
        f"SELECT doc_id, cast(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= {UNIFORM_K}"
    ),
    "stratified_sample": (
        "WITH ranked AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
        f"ORDER BY (doc_id * {KNUTH32}) % 4294967296, doc_id) AS rnk FROM documents) "
        f"SELECT lang, doc_id, cast(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= {STRATA_K}"
    ),
    "weighted_sample": (
        "WITH b AS (SELECT event_type, event_id, value, "
        f"ln((md5_number_upper(CAST(event_id AS VARCHAR)) + 0.5) / {_TWO64:.1f}) "
        "/ (abs(value) + 1.0) AS ky FROM events), "
        "r AS (SELECT event_type, event_id, value, row_number() OVER ("
        "PARTITION BY event_type ORDER BY ky DESC, event_id) AS rnk FROM b) "
        f"SELECT event_type, event_id, value, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {WEIGHTED_K}"
    ),
}


def curriculum_order(sf_dir: str):
    """Length-based training CURRICULUM (short-to-long, the classic
    curriculum-learning schedule): every document's global training rank
    under ORDER BY (n_chars, doc_id), computed distributed — per-length
    counts (length-value-bounded groupby) → driver exclusive cumsum →
    broadcast offsets → per-length in-group doc_id rank.  All integers,
    so the oracle is one ROW_NUMBER window.

    Skew note: one pathological length value funnels its docs into one
    rank task; a production corpus sub-buckets hot lengths by doc-id
    range exactly like epoch_shuffle's (shard, key-bucket) groups."""
    import numpy as np
    import pandas as pd

    from .analytics import grouped_sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    slim = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_chars": b.column("n_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed by the counts pass AND the rank groupby
    counts = grouped_sum(slim, ["n_chars"], {}, count_out="cnt").to_pandas().sort_values("n_chars")
    offs = dict(
        zip(
            counts["n_chars"],
            np.concatenate([[0], counts["cnt"].cumsum().to_numpy()[:-1]]),
        )
    )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        base = int(offs[g["n_chars"].iloc[0]])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_chars": g["n_chars"].to_numpy(),
                "curriculum_rank": base + 1 + np.arange(len(g), dtype=np.int64),
            }
        )

    return slim.groupby("n_chars").map_groups(rank, batch_format="pandas")


ORACLE_SQL["curriculum_order"] = (
    "SELECT doc_id, n_chars, "
    "CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS curriculum_rank "
    "FROM documents"
)


def q_epoch_decorrelation(sf_dir: str):
    """Shuffle-quality certification: integer-exact Spearman rank
    correlation between TWO epoch permutations (seeds 'epoch-1' /
    'epoch-2') — a healthy epoch shuffler gives ρ ≈ 0 (rho_plus1_micro
    ≈ 1,000,000); correlated epochs mean readers see near-identical
    data order every epoch.  Positions come from the same distributed
    two-level epoch rank (n_shards=1 ⇒ global order); the d² fold and
    the (2D − 6Σd²)/D arithmetic are exact bigints on both sides."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.joins import join as _join

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def order(seed: str, out: str):
        t = epoch_shuffle(ds, n_shards=1, seed=seed)

        def slim(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b.column("doc_id").cast(pa.int64()),
                    out: b.column("pos").cast(pa.int64()),
                }
            )

        return t.map_batches(slim, batch_format="pyarrow")

    j = _join(order("epoch-1", "ra"), order("epoch-2", "rb"), on="doc_id", how="inner")

    n = s2 = 0
    for b in j.iter_batches(batch_format="pyarrow"):
        d = (
            b.column("ra").to_numpy(zero_copy_only=False)
            - b.column("rb").to_numpy(zero_copy_only=False)
        ).astype(object)
        n += b.num_rows
        s2 += int((d * d).sum()) if b.num_rows else 0
    D = n * (n * n - 1)
    rho1 = (2 * D - 6 * s2) * 1_000_000 // D if D else 1_000_000
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_d2": pa.array([s2], pa.int64()),
            "rho_plus1_micro": pa.array([rho1], pa.int64()),
        }
    )


WATERFILL_BUDGET = 24_000  # tokens per equal-representation cycle


def q_mixture_waterfill(sf_dir: str, budget: int = WATERFILL_BUDGET):
    """Equal-representation mixture with availability caps — exact
    integer WATER-FILLING: give every language the same token quota
    except where a language simply doesn't have that many tokens, in
    which case it clamps at its availability and the freed budget
    raises the water level for the rest.  The standard fix for
    proportional mixtures starving low-resource languages.

    Closed form (no iteration): sort langs by (avail ASC, lang ASC);
    k = the largest count of clamped langs such that
    avail_k ≤ (B − cum_k) // (n − k); level L = (B − cum_k) // (n − k);
    leftover slots B − cum_k − L·(n−k) go +1 each to the first
    unclamped langs in sort order.  Σ quota == min(B, Σ avail)
    EXACTLY.  One distributed grouped token sum; the fill arithmetic is
    lang-bounded; DuckDB replays it with two window scans.

    Output (lang, available, quota, clamped, bonus)."""
    import pyarrow.compute as pc

    from .analytics import grouped_sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def part(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b.column("lang"),
                "n": pc.count_substring_regex(b.column("text"), r"\S+").cast(pa.int64()),
            }
        )

    avail = (
        grouped_sum(ds.map_batches(part, batch_format="pyarrow"), ["lang"], {"n": "avail"})
        .to_pandas()
        .sort_values(["avail", "lang"])
        .reset_index(drop=True)
    )  # lang-bounded
    av = avail["avail"].to_numpy().astype(np.int64)
    n = len(av)
    cum = np.cumsum(av)
    total = int(cum[-1]) if n else 0
    if n == 0:
        e = pa.array([], pa.int64())
        return pa.table(
            {"lang": pa.array([], pa.string()), "available": e, "quota": e, "clamped": e, "bonus": e}
        )
    if total <= budget:
        quota = av.copy()
        clamped = np.ones(n, np.int64)
        bonus = np.zeros(n, np.int64)
    else:
        # max (not first-failure) to mirror the SQL replay exactly even
        # if integer floors ever made the valid set non-contiguous
        ks = [
            i
            for i in range(1, n)  # n = #langs, a handful
            if av[i - 1] <= (budget - cum[i - 1]) // (n - i)
        ]
        k = max(ks, default=0)
        rem = budget - (int(cum[k - 1]) if k else 0)
        level = rem // (n - k)
        leftover = rem - level * (n - k)
        quota = np.where(np.arange(n) < k, av, level)
        clamped = (np.arange(n) < k).astype(np.int64)
        bonus = np.zeros(n, np.int64)
        bonus[k : k + leftover] = 1
        quota = quota + bonus
    return pa.table(
        {
            "lang": pa.array(avail["lang"].tolist(), pa.string()),
            "available": pa.array(av),
            "quota": pa.array(quota.astype(np.int64)),
            "clamped": pa.array(clamped),
            "bonus": pa.array(bonus),
        }
    )


ORACLE_SQL["mixture_waterfill"] = (
    "WITH t AS (SELECT lang, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) "
    "AS avail FROM documents GROUP BY lang), "
    "s AS (SELECT lang, avail, row_number() OVER (ORDER BY avail, lang) AS rn, "
    "sum(avail) OVER (ORDER BY avail, lang) AS cum, count(*) OVER () AS n FROM t), "
    f"tot AS (SELECT sum(avail) AS total FROM t), "
    # k = number of clamped langs (0 if the first lang already exceeds
    # the level); valid prefix test replayed per row
    f"kk AS (SELECT coalesce(max(rn), 0) AS k FROM s, tot "
    f"WHERE tot.total > {WATERFILL_BUDGET} AND rn < n "
    f"AND avail <= ({WATERFILL_BUDGET} - cum) // (n - rn)), "
    "lev AS (SELECT CASE WHEN tot.total <= "
    f"{WATERFILL_BUDGET} THEN NULL ELSE "
    f"({WATERFILL_BUDGET} - coalesce((SELECT cum FROM s WHERE rn = kk.k), 0)) // "
    "(s1.n - kk.k) END AS level, "
    f"CASE WHEN tot.total <= {WATERFILL_BUDGET} THEN 0 ELSE "
    f"({WATERFILL_BUDGET} - coalesce((SELECT cum FROM s WHERE rn = kk.k), 0)) % "
    "(s1.n - kk.k) END AS leftover, kk.k AS k "
    "FROM kk, tot, (SELECT DISTINCT n FROM s) s1) "
    "SELECT s.lang, s.avail AS available, "
    "CAST(CASE WHEN lev.level IS NULL OR s.rn <= lev.k THEN s.avail "
    "ELSE lev.level + (CASE WHEN s.rn > lev.k AND s.rn <= lev.k + lev.leftover THEN 1 ELSE 0 END) "
    "END AS BIGINT) AS quota, "
    "CAST(CASE WHEN lev.level IS NULL OR s.rn <= lev.k THEN 1 ELSE 0 END AS BIGINT) AS clamped, "
    "CAST(CASE WHEN lev.level IS NOT NULL AND s.rn > lev.k AND s.rn <= lev.k + lev.leftover "
    "THEN 1 ELSE 0 END AS BIGINT) AS bonus "
    "FROM s, lev"
)


SPLIT_PSI_BINS = 10


def q_split_psi_drift(sf_dir: str, bins: int = SPLIT_PSI_BINS):
    """Split-representativeness PSI: the doc-length distribution of the
    train split vs the val split over fixed-width n_chars bins, per-bin
    PSI contribution in micro-nats (+1 smoothing) — certifies that the
    hash split didn't skew a covariate (PSI > 0.2 is the classic alarm
    threshold; a healthy hash split reads near zero).  Composes the
    certified split hash with the certified PSI arithmetic.

    One min/max partial pass + ONE (split, bin) grouped count; the PSI
    arithmetic runs on the bins-bounded table."""
    import pyarrow.compute as pc

    from .analytics import grouped_sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def ranges(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").cast(pa.int64())
        return pa.table(
            {
                "v0": pa.array([pc.min(v).as_py()], pa.int64()),
                "v1": pa.array([pc.max(v).as_py()], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(ds.map_batches(ranges, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    v0 = int(pc.min(parts.column("v0")).as_py())
    v1 = int(pc.max(parts.column("v1")).as_py())
    width = v1 - v0 + 1

    def assign(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_val = pc.equal(split_of_ids(b.column("doc_id")), "val")
        return pa.table(
            {
                "is_val": pc.cast(is_val, pa.int64()),
                "bin": pa.array(np.minimum(bins - 1, (v - v0) * bins // width)),
            }
        )

    g = grouped_sum(
        ds.map_batches(assign, batch_format="pyarrow"), ["is_val", "bin"], {}, count_out="n"
    ).to_pandas()  # ≤ 2 × bins rows
    grid = np.zeros((2, bins), dtype=np.int64)
    for _, r in g.iterrows():
        grid[int(r["is_val"]), int(r["bin"])] = int(r["n"])
    na, nb = int(grid[0].sum()), int(grid[1].sum())
    p_tr = (grid[0] + 1.0) / (na + float(bins))
    p_va = (grid[1] + 1.0) / (nb + float(bins))
    psi = np.floor((p_tr - p_va) * np.log(p_tr / p_va) * 1e6 + 0.5).astype(np.int64)
    return pa.table(
        {
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "n_train": pa.array(grid[0]),
            "n_val": pa.array(grid[1]),
            "psi_micro": pa.array(psi),
        }
    )


ORACLE_SQL["split_psi_drift"] = (
    f"WITH e AS (SELECT CAST(n_chars AS BIGINT) AS v, "
    f"CASE WHEN {SPLIT_CASE_SQL} = 'val' THEN 1 ELSE 0 END AS is_val FROM documents), "
    "r AS (SELECT min(v) AS v0, max(v) AS v1 FROM e), "
    f"a AS (SELECT is_val, least({SPLIT_PSI_BINS - 1}, "
    f"(v - v0) * {SPLIT_PSI_BINS} // (v1 - v0 + 1)) AS bin FROM e, r), "
    "g AS (SELECT bin, CAST(sum(1 - is_val) AS BIGINT) AS n_train, "
    "CAST(sum(is_val) AS BIGINT) AS n_val FROM a GROUP BY bin), "
    f"bgrid AS (SELECT unnest(generate_series(0, {SPLIT_PSI_BINS - 1})) AS bin), "
    "filled AS (SELECT CAST(bgrid.bin AS BIGINT) AS bin, coalesce(n_train, 0) AS n_train, "
    "coalesce(n_val, 0) AS n_val FROM bgrid LEFT JOIN g ON g.bin = bgrid.bin), "
    "tot AS (SELECT sum(n_train) AS na, sum(n_val) AS nb FROM filled) "
    "SELECT bin, n_train, n_val, "
    f"CAST(floor(((n_train + 1.0) / (na + {float(SPLIT_PSI_BINS)}) - "
    f"(n_val + 1.0) / (nb + {float(SPLIT_PSI_BINS)})) "
    f"* ln(((n_train + 1.0) / (na + {float(SPLIT_PSI_BINS)})) / "
    f"((n_val + 1.0) / (nb + {float(SPLIT_PSI_BINS)}))) "
    "* 1000000 + 0.5) AS BIGINT) AS psi_micro FROM filled, tot"
)
