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


SPAN_W = 8  # tokens per dedup tile


def q_span_dedup_clean(sf_dir: str, w: int = SPAN_W):
    """Cross-document exact span dedup REMOVAL (the C4 "duplicated
    three-sentence span" rule / Lee et al. 2022 ExactSubstr shape, on
    non-overlapping tiles): split each doc into w-token tiles (trailing
    partial tile included), drop every tile whose exact token string
    occurred EARLIER in the corpus — global order (doc_id, tile_idx),
    first occurrence survives, repeats within one doc count too — and
    reassemble the surviving tiles into clean text per doc.  Complements
    ``q_dup_spans_docs`` (decontam.py), which only FLAGS duplicated
    windows; this emits the cleaned corpus plus per-doc drop tallies.

    Reference analog: duplicate finder + content-dedup decision
    (app/crawler/crawlers.py hash-key paths), applied inside documents
    instead of across files.

    Scale posture (100 TB): a boilerplate tile present in 10^9 docs
    would make any direct groupby/join on the tile key one giant task,
    so the winner decision uses the per-block partial pattern: each
    block keeps only its LOCAL-min occurrence per tile as a candidate
    (everything else is definitively dropped without leaving the
    block), candidates (distinct-tile-bounded, ≤ blocks per hot tile)
    flow through a Min aggregate + co-partitioned join, and the only
    corpus-sized exchange is the final per-doc reassembly groupby.
    """
    from ray.data.aggregate import Min

    max_ti = 1 << 20  # zkey packing bound; 10^6 tiles/doc ≫ any real doc

    def tile_batch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column("text"), r"\s+")
        lens = (
            pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks().to_numpy(zero_copy_only=False)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_tiles = -(-lens // w)  # ceil; 0-token docs emit no tiles
        total = int(n_tiles.sum())
        if not total:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "ti": pa.array([], pa.int64()),
                    "tile": pa.array([], pa.string()),
                    "zkey": pa.array([], pa.int64()),
                }
            )
        row = np.repeat(np.arange(len(lens)), n_tiles)
        off = np.concatenate([[0], np.cumsum(n_tiles)])
        ti = np.arange(total) - np.repeat(off[:-1], n_tiles)
        if np.any(ti >= max_ti):
            raise ValueError("tile index exceeds zkey packing bound")
        tok_off = np.concatenate([[0], np.cumsum(lens)])[:-1]
        start = tok_off[row] + ti * w  # first token of each tile
        end = tok_off[row] + np.minimum((ti + 1) * w, lens[row])
        # join up to w tokens per tile with ONE vectorized pass per slot
        # (the only Python loop is w iterations — the decontam pattern)
        tiles = np.full(total, "", dtype=object)
        for j in range(w):
            idx = start + j
            valid = idx < end
            if not valid.any():
                break
            piece = np.where(valid, flat[np.minimum(idx, len(flat) - 1)], "").astype(object)
            if j:
                piece = np.where(valid, " ", "").astype(object) + piece
            tiles = tiles + piece
        did = doc_ids[row]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "ti": pa.array(ti, pa.int64()),
                "tile": pa.array(tiles, pa.string()),
                "zkey": pa.array(did * max_ti + ti, pa.int64()),
            }
        )

    def local_min_partial(b: pa.Table) -> pa.Table:
        """Block-local pre-aggregation: one (tile, min zkey) row per
        distinct tile in this block — a hot tile leaves each block as ONE
        row, so the winner groupby's key volume is dedup-bounded and
        skew-safe regardless of how many occurrences the tile has."""
        import pandas as pd

        if not b.num_rows:
            return pa.table({"tile": pa.array([], pa.string()), "zkey": pa.array([], pa.int64())})
        z = b.column("zkey").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(b.column("tile").to_pandas(), sort=False)
        gmin = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(gmin, codes, z)
        return pa.table({"tile": pa.array(uniq, pa.string()), "zkey": pa.array(gmin, pa.int64())})

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tiles = docs.map_batches(tile_batch, batch_format="pyarrow")

    # winner per tile = global min zkey; zkey ENCODES the winning (doc_id,
    # ti) coordinates, so no join back on the tile key is ever needed —
    # the corpus stream is only shuffled ONCE (by doc_id, for reassembly)
    # and the tile-keyed exchange sees pre-aggregated dedup-bounded rows.
    # Both branches re-execute the cheap tile pass independently; since
    # local_min_partial's OUTPUT feeds a Min aggregate whose result is
    # block-split-independent, nondeterministic batch boundaries between
    # the two executions cannot change the answer.
    winners = (
        tiles.map_batches(local_min_partial, batch_format="pyarrow")
        .groupby("tile")
        .aggregate(Min("zkey"))
    )

    def _coords(b: pa.Table) -> pa.Table:
        z = b.column("min(zkey)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(z // max_ti, pa.int64()),
                "ti": pa.array(z % max_ti, pa.int64()),
                "tile": pa.array(np.full(len(z), "", object), pa.string()),
                "side": pa.array(np.ones(len(z), np.int8)),
            }
        )

    winner_coords = winners.map_batches(_coords, batch_format="pyarrow")
    tagged = tiles.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "ti": b.column("ti"),
                "tile": b.column("tile"),
                "side": pa.array(np.zeros(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )

    def reassemble(g):
        import pandas as pd

        side = g["side"].to_numpy()
        win_ti = set(g["ti"].to_numpy()[side == 1].tolist())
        rows = g[side == 0].sort_values("ti")
        keep = rows["ti"].isin(win_ti).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": [int(g["doc_id"].iloc[0])],
                "clean_text": [" ".join(rows["tile"].to_numpy()[keep])],
                "n_tiles": [len(rows)],
                "n_dropped": [int((~keep).sum())],
            }
        )

    return (
        tagged.union(winner_coords)
        .groupby("doc_id")
        .map_groups(reassemble, batch_format="pandas")
    )


def _span_dedup_clean_sql(w: int = SPAN_W) -> str:
    """DuckDB replay: tile via list_slice over the token array, rank each
    tile string by (doc_id, ti), keep rank 1, string_agg the survivors."""
    return (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents), "
        f"tiles AS (SELECT doc_id, l, unnest(range(0, CAST(ceil(len(l) / {w}.0) AS BIGINT))) AS ti "
        "FROM toks WHERE len(l) > 0), "
        f"ts AS (SELECT doc_id, ti, array_to_string(list_slice(l, ti * {w} + 1, ti * {w} + {w}), ' ') AS tile "
        "FROM tiles), "
        "rk AS (SELECT doc_id, ti, tile, row_number() OVER (PARTITION BY tile ORDER BY doc_id, ti) AS rn "
        "FROM ts) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "coalesce(string_agg(CASE WHEN rn = 1 THEN tile END, ' ' ORDER BY ti), '') AS clean_text, "
        "CAST(count(*) AS BIGINT) AS n_tiles, "
        "CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped "
        "FROM rk GROUP BY doc_id"
    )


ORACLE_SQL = {
    "corpus_clean_exact": _corpus_clean_exact_sql(),
    "span_dedup_clean": _span_dedup_clean_sql(),
}


def corpus_funnel(sf_dir: str):
    """End-to-end TEXT curation FUNNEL — the composed gate stack a
    pretraining-prep run applies, reported as stage-by-stage survivor
    counts (the text twin of image_corpus.curation_funnel):

      total     all documents
      clean     C4-style composed clean (langid allow-list, quality
                score, min-chars, global exact dedup — the
                corpus_clean_exact rules)
      gopher    + the Gopher quality-rule gate (textops.gopher_flag_batch)
      decontam  + benchmark decontamination (zero 8-gram hits against the
                broadcast benchmark set)

    One corpus pass for the clean stream; gopher + decontam flags ride
    the SAME pass over the kept stream (per-batch integer partials, the
    benchmark set broadcast once) — nothing corpus-sized is pinned."""
    from .decontam import _token_hashes, _window_hashes, benchmark_gram_hashes
    from .textops import gopher_flag_batch

    kept, tally = clean_text_corpus(sf_dir, neardup=False, keep_text=True)
    bench_ref = ray.put(benchmark_gram_hashes(sf_dir))

    def partial(b: pa.Table) -> pa.Table:
        g = gopher_flag_batch(b.column("text")).column("gopher_pass")
        gmask = pc.equal(g, 1)
        bset = ray.get(bench_ref)
        h, row, _ = _token_hashes(b.column("text"))
        gr, grow = _window_hashes(h, row, 8)
        hit_doc = np.zeros(b.num_rows, bool)
        if len(gr) and len(bset):
            pos = np.searchsorted(bset, gr)
            hit = (pos < len(bset)) & (bset[np.minimum(pos, len(bset) - 1)] == gr)
            hit_doc[np.unique(grow[hit])] = True
        gm = gmask.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "clean": pa.array([b.num_rows], pa.int64()),
                "gopher": pa.array([int(gm.sum())], pa.int64()),
                "decontam": pa.array([int((gm & ~hit_doc).sum())], pa.int64()),
            }
        )

    sums = {"clean": 0, "gopher": 0, "decontam": 0}
    for b in kept.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k in sums:
            sums[k] += int(pc.sum(b.column(k)).as_py() or 0)
    return pa.table(
        {
            "stage": pa.array(["total", "clean", "gopher", "decontam"], pa.string()),
            "n": pa.array(
                [int(tally["total"]), sums["clean"], sums["gopher"], sums["decontam"]],
                pa.int64(),
            ),
        }
    )


def _corpus_funnel_sql() -> str:
    """Funnel replay: each stage's CTE is the already-bit-exact oracle of
    its component query (DuckDB allows a WITH-bearing subquery as a CTE
    body), so the funnel certifies the COMPOSITION, not new kernels."""
    from .decontam import ORACLE_SQL as DECONTAM_SQL
    from .textops import ORACLE_SQL as TEXT_SQL

    return (
        f"WITH ce AS ({_corpus_clean_exact_sql()}), "
        f"g AS ({TEXT_SQL['gopher_rules']}), "
        f"dh AS ({DECONTAM_SQL['decontam_hits']}) "
        "SELECT 'total' AS stage, CAST(count(*) AS BIGINT) AS n FROM documents "
        "UNION ALL SELECT 'clean', CAST(count(*) AS BIGINT) FROM ce "
        "UNION ALL SELECT 'gopher', CAST(count(*) AS BIGINT) "
        "FROM ce JOIN g USING (doc_id) WHERE g.gopher_pass = 1 "
        "UNION ALL SELECT 'decontam', CAST(count(*) AS BIGINT) "
        "FROM ce JOIN g USING (doc_id) WHERE g.gopher_pass = 1 "
        "AND doc_id NOT IN (SELECT doc_id FROM dh)"
    )


ORACLE_SQL["corpus_funnel"] = _corpus_funnel_sql()


def q_corpus_release(sf_dir: str):
    """The composed RELEASE pipeline — the full pretraining-prep chain
    certified end-to-end in one table: C4-style clean (langid allow-list
    + quality + min-chars + global exact dedup) → Gopher gate →
    benchmark decontamination → salted-md5 train/val split → per-(split,
    lang) release datacard (docs, chars, whitespace tokens).  Every
    stage is an already-bit-exact oracle; the release table certifies
    their COMPOSITION (survivor identity AND the final corpus stats).

    One pass over the kept stream: gopher + decontam flags and the split
    assignment ride the same batch; (split, lang)-keyed grouped sums
    fold the partials (split×lang-bounded output)."""
    from .decontam import _token_hashes, _window_hashes, benchmark_gram_hashes
    from .sampling import split_of_ids
    from .textops import gopher_flag_batch
    from .analytics import grouped_sum

    kept, _ = clean_text_corpus(sf_dir, neardup=False, keep_text=True)
    bench_ref = ray.put(benchmark_gram_hashes(sf_dir))

    def partial(b: pa.Table) -> pa.Table:
        g = gopher_flag_batch(b.column("text")).column("gopher_pass")
        gm = pc.equal(g, 1).to_numpy(zero_copy_only=False)
        bset = ray.get(bench_ref)
        h, row, _ = _token_hashes(b.column("text"))
        gr, grow = _window_hashes(h, row, 8)
        hit_doc = np.zeros(b.num_rows, bool)
        if len(gr) and len(bset):
            pos = np.searchsorted(bset, gr)
            hit = (pos < len(bset)) & (bset[np.minimum(pos, len(bset) - 1)] == gr)
            hit_doc[np.unique(grow[hit])] = True
        keep = pa.array(gm & ~hit_doc)
        t = b.filter(keep)
        return pa.table(
            {
                "split": split_of_ids(t.column("doc_id")),
                "lang": t.column("lang"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
                "toks": pc.count_substring_regex(t.column("text"), r"\S+").cast(pa.int64()),
            }
        )

    return grouped_sum(
        kept.map_batches(partial, batch_format="pyarrow"),
        ["split", "lang"],
        {"one": "n_docs", "chars": "n_chars", "toks": "n_tokens"},
    )


def _corpus_release_sql() -> str:
    from .decontam import ORACLE_SQL as DECONTAM_SQL
    from .sampling import SPLIT_CASE_SQL
    from .textops import ORACLE_SQL as TEXT_SQL

    return (
        f"WITH ce AS ({_corpus_clean_exact_sql()}), "
        f"g AS ({TEXT_SQL['gopher_rules']}), "
        f"dh AS ({DECONTAM_SQL['decontam_hits']}), "
        "rel AS (SELECT d.doc_id, d.lang, d.text FROM documents d "
        "JOIN ce ON ce.doc_id = d.doc_id "
        "JOIN g ON g.doc_id = d.doc_id AND g.gopher_pass = 1 "
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM dh)) "
        f"SELECT {SPLIT_CASE_SQL} AS split, lang, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(length(text)) AS BIGINT) AS n_chars, "
        "CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens "
        "FROM rel GROUP BY split, lang"
    )


ORACLE_SQL["corpus_release"] = _corpus_release_sql()
