"""Benchmark decontamination and intra-document repetition statistics.

Two published training-data-hygiene operators over the documents table
(reference analog: the quality/extract processors of
app/processors/path_processor.py — per-record derived signals; here the
signal is token n-gram structure, the shape GPT-3 App. C / Gopher §A5
use for decontamination and repetition filtering):

- ``decontaminate``: flag documents sharing any token W-gram with a
  benchmark set.  The benchmark side is SMALL by construction (eval
  suites are thousands of grams, not billions), so it is the canonical
  broadcast-probe: one ``ray.put`` of a sorted uint64 gram-hash array,
  every batch probes it with ``np.searchsorted`` — zero shuffle, the
  corpus streams through untouched.  At 100 TB only the hit rows
  (output-sized) leave the map stage.
- ``repetition_stats``: per-document duplicate-bigram counts (the
  Gopher repetition rule's measurable core).  Stateless single-pass
  map_batches; the duplicate fraction is exposed as two INTEGER columns
  (n_grams, n_distinct) so the DuckDB oracle compares exactly instead
  of through float rounding.

Both build on one vectorized kernel: per-batch token xxh64 hashes plus
rolling polynomial window combines — no Python loop over rows or
tokens; the only loop is W (window width) numpy passes.

Parity note: the engine compares token SEQUENCES via 64-bit combined
hashes, the SQL oracle via single-space-joined gram strings.  The two
are equivalent because tokens contain no whitespace (space-join is
injective) and hash collisions are 2^-64-scale events the value-hash
check would surface loudly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import xxh64_batch

# polynomial base for window combines (odd -> invertible mod 2^64, so
# sliding windows that differ in any slot hash differently w.h.p.)
_P = np.uint64(1099511628211)

_TOKEN_SEED = 5309


def _token_hashes(text) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a string column and hash each token → (hashes, row_idx,
    per_row_counts).  Token rule matches the oracle's
    regexp_extract_all(text, '\\S+'): split on whitespace, drop empties;
    null text → zero tokens."""
    nrows = len(text)
    toks = pc.split_pattern_regex(text, r"\s+")
    lens = (
        pc.fill_null(pc.list_value_length(toks), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    flat = pc.list_flatten(toks).combine_chunks()
    keep = pc.invert(pc.equal(flat, ""))
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    row = np.repeat(np.arange(nrows, dtype=np.int64), lens)[keep_np]
    h = xxh64_batch(flat.filter(keep), seed=_TOKEN_SEED)
    n = np.bincount(row, minlength=nrows)
    return h, row, n


def _window_hashes(h: np.ndarray, row: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling W-token window hashes over the flat token stream →
    (gram_hashes, gram_row_idx), keeping only windows that lie entirely
    inside one document.  g[i] = Σ_j h[i+j]·P^j mod 2^64 — W shifted
    numpy adds, no per-token loop."""
    total = len(h)
    if total < w:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    m = total - w + 1
    acc = np.zeros(m, dtype=np.uint64)
    p = np.uint64(1)
    for j in range(w):
        acc += h[j : j + m] * p
        p = p * _P  # uint64 wraparound is the modulus
    valid = row[:m] == row[w - 1 :]
    return acc[valid], row[:m][valid]


def _docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def benchmark_gram_hashes(sf_dir: str, w: int = 8, mod: int = 97) -> np.ndarray:
    """Deterministic stand-in benchmark set: the first W-token gram of
    every document with doc_id % mod == 0.  Streams the (column-pruned,
    filtered) docs and collects only the gram hashes — the benchmark
    side is output-sized (thousands of grams), never the corpus."""

    def first_gram(b: pa.Table) -> pa.Table:
        # (doc_id % mod == 0) — modulo via subtract(div*mod)
        d = b.column("doc_id").cast(pa.int64())
        sel = pc.equal(pc.subtract(d, pc.multiply(pc.divide(d, mod), mod)), 0)
        t = b.filter(sel)
        h, row, n = _token_hashes(t.column("text"))
        g, grow = _window_hashes(h, row, w)
        if len(g) == 0:
            return pa.table({"gram": pa.array([], pa.uint64())})
        # first window per doc: positions where grow changes
        firsts = np.flatnonzero(np.r_[True, grow[1:] != grow[:-1]])
        return pa.table({"gram": pa.array(g[firsts], pa.uint64())})

    parts = [
        b.column("gram").to_numpy(zero_copy_only=False)
        for b in _docs(sf_dir).map_batches(first_gram, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(ds, bench: np.ndarray, w: int = 8, out_col: str = "hits"):
    """Documents sharing ≥1 token W-gram with the benchmark set →
    (doc_id, out_col) where the count = number of W-gram positions whose
    gram is in the set.  ``bench`` is ray.put once (sorted uint64 hashes)
    and probed per batch with searchsorted — broadcast-probe, no shuffle."""
    bench_ref = ray.put(np.asarray(bench, dtype=np.uint64))

    def probe(b: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        h, row, _ = _token_hashes(b.column("text"))
        g, grow = _window_hashes(h, row, w)
        if len(g) == 0 or len(bset) == 0:
            return pa.table({"doc_id": b.column("doc_id").slice(0, 0), out_col: pa.array([], pa.int64())})
        pos = np.searchsorted(bset, g)
        hit = (pos < len(bset)) & (bset[np.minimum(pos, len(bset) - 1)] == g)
        per_doc = np.bincount(grow[hit], minlength=b.num_rows)
        sel = np.flatnonzero(per_doc > 0)
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(pa.array(sel, pa.int64())),
                out_col: pa.array(per_doc[sel], pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def boilerplate_gram_hashes(ds, w: int = 3, min_docs: int = 3) -> np.ndarray:
    """Token W-grams occurring in ≥ ``min_docs`` DISTINCT documents —
    the duplicate-span / boilerplate signal of Lee et al.'s dedup family.

    Scale design: each document is one row, so per-batch distinct
    (gram, doc) counting is exact and the cross-batch distinct-doc count
    is a plain SUM of per-batch partials — only (gram_hash, count) pairs
    ever shuffle (16 bytes per distinct gram per block), never text.
    The returned set is assumption-documented boilerplate-sized (grams
    above the threshold), sorted for searchsorted probing."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        h, row, _ = _token_hashes(b.column("text"))
        g, grow = _window_hashes(h, row, w)
        if len(g) == 0:
            return pa.table({"gram": pa.array([], pa.int64()), "nd_p": pa.array([], pa.int64())})
        # distinct (doc, gram) within the batch: sort pairs, drop repeats
        order = np.lexsort((g, grow))
        gs, rs = g[order], grow[order]
        first = np.r_[True, (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])]
        gu, nd = np.unique(gs[first], return_counts=True)
        return pa.table({"gram": gu.view(np.int64), "nd_p": nd.astype(np.int64)})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("gram").aggregate(Sum("nd_p"))
    parts = [
        b.column("gram").to_numpy(zero_copy_only=False)
        for b in agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("sum(nd_p)"), min_docs)).select(["gram"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.sort(np.concatenate(parts).astype(np.int64).view(np.uint64))


def q_boilerplate_docs(sf_dir: str, w: int = 3, min_docs: int = 3):
    """Per-doc count of boilerplate W-gram positions (docs with ≥1 hit)."""
    bp = boilerplate_gram_hashes(_docs(sf_dir), w=w, min_docs=min_docs)
    return decontaminate(_docs(sf_dir), bp, w=w, out_col="bp_hits")


def repetition_stats(ds, w: int = 2):
    """Per-document repeated-W-gram statistics → (doc_id, n_grams,
    n_distinct); documents with fewer than W tokens have no windows and
    are absent (matching the SQL oracle's join semantics).  The
    duplicate fraction is 1 - n_distinct/n_grams; kept as integers for
    exact oracle comparison."""

    def stats(b: pa.Table) -> pa.Table:
        g, grow = _window_hashes(*_token_hashes(b.column("text"))[:2], w)
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": b.column("doc_id").slice(0, 0),
                    "n_grams": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                }
            )
        n_grams = np.bincount(grow, minlength=b.num_rows)
        # distinct per doc: sort (row, gram) pairs, count pair boundaries
        order = np.lexsort((g, grow))
        gs, rs = g[order], grow[order]
        new_pair = np.r_[True, (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])]
        n_distinct = np.bincount(rs[new_pair], minlength=b.num_rows)
        sel = np.flatnonzero(n_grams > 0)
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(pa.array(sel, pa.int64())),
                "n_grams": pa.array(n_grams[sel], pa.int64()),
                "n_distinct": pa.array(n_distinct[sel], pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


_SPAN_SEED = 7741


def _window_sites(b: pa.Table, window: int, stride: int):
    """Aligned character-window sites for one batch → (doc_idx ROW indices,
    pos, hash).  The loop is over WINDOW INDEX (≤ max_len/stride per
    batch), each iteration one vectorized slice+hash over the whole
    column — never a loop over rows."""
    arr = b.column("text")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lens = pc.fill_null(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    nwin = np.where(lens >= window, (lens - window) // stride + 1, 0)
    mx = int(nwin.max()) if len(nwin) else 0
    rows, poss, hs = [], [], []
    for i in range(mx):
        start = i * stride
        idx = np.flatnonzero(lens >= start + window)
        sub = pc.utf8_slice_codeunits(arr.take(pa.array(idx, pa.int64())), start, start + window)
        rows.append(idx)
        poss.append(np.full(len(idx), start, np.int64))
        hs.append(xxh64_batch(sub, seed=_SPAN_SEED))
    if not rows:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.uint64)
    return np.concatenate(rows), np.concatenate(poss), np.concatenate(hs)


def q_dup_spans_docs(sf_dir: str, window: int = 32, stride: int = 16, min_sites: int = 2):
    """Exact substring-duplication SPANS (Lee et al., 'Deduplicating
    Training Data Makes Language Models Better', char-window form): every
    stride-aligned ``window``-char site whose text occurs at ≥2 sites
    corpus-wide → (doc_id, pos).  Two streaming passes, neither
    materializes the window table:

    1. counts: per-batch partial counts of window hashes (np.unique) →
       one hash-keyed groupby of 16-byte partials → the ≥2 keys
       (duplicate-span-sized, the output's own scale) sort onto the
       driver;
    2. probe: recompute sites per batch, searchsorted against the
       broadcast key set, emit only hit sites.

    The gram-count twin is q_boilerplate_docs (token W-grams, counts per
    doc); this one keeps POSITIONS so a downstream cut pass can excise
    the span (the paper's actual intervention)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        _, _, h = _window_sites(b, window, stride)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()), "c_p": pa.array([], pa.int64())})
        hu, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": hu.view(np.int64), "c_p": cnt.astype(np.int64)})

    agg = _docs(sf_dir).map_batches(partial, batch_format="pyarrow").groupby("h").aggregate(Sum("c_p"))
    parts = [
        t.column("h").to_numpy(zero_copy_only=False)
        for t in agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("sum(c_p)"), min_sites)).select(["h"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    dup = np.sort(np.concatenate(parts).view(np.uint64)) if parts else np.empty(0, np.uint64)
    dup_ref = ray.put(dup)

    def probe(b: pa.Table) -> pa.Table:
        keys = ray.get(dup_ref)
        row, pos, h = _window_sites(b, window, stride)
        if len(h) == 0 or len(keys) == 0:
            return pa.table({"doc_id": b.column("doc_id").slice(0, 0), "pos": pa.array([], pa.int64())})
        p = np.searchsorted(keys, h)
        hit = (p < len(keys)) & (keys[np.minimum(p, len(keys) - 1)] == h)
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(pa.array(row[hit], pa.int64())).cast(pa.int64()),
                "pos": pa.array(pos[hit], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(probe, batch_format="pyarrow")


def q_decontam_hits(sf_dir: str, w: int = 8, mod: int = 97):
    return decontaminate(_docs(sf_dir), benchmark_gram_hashes(sf_dir, w=w, mod=mod), w=w)


def q_repetition_docs(sf_dir: str):
    return repetition_stats(_docs(sf_dir), w=2)


# PII scrubbing patterns — RE2-compatible so pyarrow.compute and DuckDB
# execute the IDENTICAL automaton (the FineWeb/Pile anonymization step:
# emails, US-style phone numbers, IPv4 addresses → typed placeholders).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(ds):
    """Scrub PII from a (doc_id, text) Dataset: replace emails → <EMAIL>,
    phone numbers → <PHONE>, IPv4 → <IP> (in that fixed order — emails
    first so their dotted domains can't be half-eaten by the IP rule)
    and count each category per doc.  One zero-shuffle streaming pass;
    every kernel is a compiled RE2 via pyarrow.compute (count, then
    global replace)."""

    def kern(b: pa.Table) -> pa.Table:
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_em = pc.count_substring_regex(text, PII_EMAIL_RE).cast(pa.int64())
        clean = pc.replace_substring_regex(text, pattern=PII_EMAIL_RE, replacement="<EMAIL>")
        n_ph = pc.count_substring_regex(clean, PII_PHONE_RE).cast(pa.int64())
        clean = pc.replace_substring_regex(clean, pattern=PII_PHONE_RE, replacement="<PHONE>")
        n_ip = pc.count_substring_regex(clean, PII_IP_RE).cast(pa.int64())
        clean = pc.replace_substring_regex(clean, pattern=PII_IP_RE, replacement="<IP>")
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_emails": n_em,
                "n_phones": n_ph,
                "n_ips": n_ip,
                "text_clean": clean,
            }
        )

    return ds.map_batches(kern, batch_format="pyarrow")


def q_pii_scrub(sf_dir: str):
    """SQL-CHECKED PII scrub: the synthetic corpus carries no PII, so
    each doc is first dirtied by a DETERMINISTIC doc_id-keyed injection
    (doc_id % 4 ∈ {nothing, email, email+phone, all three} appended with
    id-derived addresses) and then scrubbed; the oracle rebuilds the
    SAME dirty text and replays the full count+replace chain in DuckDB
    RE2, certifying the scrub kernels end-to-end (the crawl_url_canonical
    exerciser pattern)."""

    def dirty(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").cast(pa.int64())
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        dn = d.to_numpy(zero_copy_only=False)
        id_s = pc.cast(d, pa.string())
        email = pc.binary_join_element_wise(
            pa.scalar(" Contact user"), id_s, pa.scalar("@example.org now."), ""
        )
        phone = pc.binary_join_element_wise(
            pa.scalar(" Call 555-"),
            pc.utf8_lpad(pc.cast(pa.array(dn % 10000, pa.int64()), pa.string()), 4, "0"),
            pa.scalar(" today."),
            "",
        )
        ip = pc.binary_join_element_wise(
            pa.scalar(" Logged from 10."),
            pc.cast(pa.array(dn % 256, pa.int64()), pa.string()),
            pa.scalar("."),
            pc.cast(pa.array((dn // 256) % 256, pa.int64()), pa.string()),
            pa.scalar("."),
            pc.cast(pa.array((dn // 65536) % 256, pa.int64()), pa.string()),
            pa.scalar(" tonight."),
            "",
        )
        v = dn % 4
        empty = pa.scalar("")
        add_email = pc.if_else(pa.array(v >= 1), email, empty)
        add_phone = pc.if_else(pa.array(v >= 2), phone, empty)
        add_ip = pc.if_else(pa.array(v == 3), ip, empty)
        out = pc.binary_join_element_wise(text, add_email, add_phone, add_ip, "")
        return pa.table({"doc_id": d, "text": out})

    return pii_scrub(_docs(sf_dir).map_batches(dirty, batch_format="pyarrow"))


ORACLE_SQL = {
    "decontam_hits": (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents), "
        "bench AS (SELECT DISTINCT array_to_string(list_slice(l, 1, 8), ' ') AS gram "
        "FROM toks WHERE doc_id % 97 = 0 AND len(l) >= 8), "
        "pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 6)) AS i FROM toks WHERE len(l) >= 8), "
        "grams AS (SELECT doc_id, array_to_string(list_slice(l, i, i + 7), ' ') AS gram FROM pos) "
        "SELECT g.doc_id, CAST(count(*) AS BIGINT) AS hits "
        "FROM grams g JOIN bench b USING (gram) GROUP BY g.doc_id"
    ),
    "boilerplate_docs": (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents), "
        "pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i FROM toks WHERE len(l) >= 3), "
        "grams AS (SELECT doc_id, array_to_string(list_slice(l, i, i + 2), ' ') AS g FROM pos), "
        "bp AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 3) "
        "SELECT g.doc_id, CAST(count(*) AS BIGINT) AS bp_hits "
        "FROM grams g JOIN bp USING (g) GROUP BY g.doc_id"
    ),
    "dup_spans_docs": (
        "WITH idx AS (SELECT doc_id, text, unnest(generate_series(0, (length(text)-32)//16)) AS i "
        "FROM documents WHERE length(text) >= 32), "
        "s AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(i*16 AS BIGINT) AS pos, "
        "substr(text, CAST(i*16+1 AS BIGINT), 32) AS sh FROM idx) "
        "SELECT doc_id, pos FROM s WHERE sh IN (SELECT sh FROM s GROUP BY sh HAVING count(*) >= 2)"
    ),
    "pii_scrub": (
        "WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id, text, "
        "' Contact user' || CAST(doc_id AS VARCHAR) || '@example.org now.' AS em, "
        "' Call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today.' AS ph, "
        "' Logged from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
        "CAST((doc_id // 256) % 256 AS VARCHAR) || '.' || "
        "CAST((doc_id // 65536) % 256 AS VARCHAR) || ' tonight.' AS ip FROM documents), "
        "t AS (SELECT id AS doc_id, text || "
        "CASE WHEN id % 4 >= 1 THEN em ELSE '' END || "
        "CASE WHEN id % 4 >= 2 THEN ph ELSE '' END || "
        "CASE WHEN id % 4 = 3 THEN ip ELSE '' END AS dirty FROM d), "
        "s1 AS (SELECT doc_id, "
        "CAST(len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, "
        "regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS c1 FROM t), "
        "s2 AS (SELECT doc_id, n_emails, "
        "CAST(len(regexp_extract_all(c1, '\\b555-[0-9]{4}\\b')) AS BIGINT) AS n_phones, "
        "regexp_replace(c1, '\\b555-[0-9]{4}\\b', '<PHONE>', 'g') AS c2 FROM s1) "
        "SELECT doc_id, n_emails, n_phones, "
        "CAST(len(regexp_extract_all(c2, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT) AS n_ips, "
        "regexp_replace(c2, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS text_clean "
        "FROM s2"
    ),
    "repetition_docs": (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents), "
        "pos AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM toks WHERE len(l) >= 2), "
        "grams AS (SELECT doc_id, array_to_string(list_slice(l, i, i + 1), ' ') AS g FROM pos) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM grams GROUP BY doc_id"
    ),
}


def q_doc_novelty(sf_dir: str, w: int = 3):
    """Per-document n-gram novelty — the memorization/uniqueness metric:
    fraction of a doc's token W-grams that appear in NO other document
    (df = 1 across the corpus), integer micros.  High-novelty docs carry
    information the rest of the corpus lacks; near-zero novelty marks
    templated/boilerplate pages.

    Two shuffles, both gram-keyed: a (gram, doc) dedup + grouped df
    count, then the gram stream joins back against the df table to fold
    per-doc (total, unique) tallies.  Gram identity is the rolling
    xxh64 window combine (decontam's kernel); the oracle counts
    space-joined gram STRINGS — equivalent because tokens contain no
    whitespace (module parity note)."""
    from ..stages.joins import join as _join
    from .analytics import grouped_sum

    ds = _docs(sf_dir)

    def grams(b: pa.Table) -> pa.Table:
        h, row, _ = _token_hashes(b.column("text"))
        gh, grow = _window_hashes(h, row, w)
        doc = b.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)[grow]
        return pa.table(
            {"g": pa.array(gh.view(np.int64)), "doc_id": pa.array(doc, pa.int64())}
        )

    g = ds.map_batches(grams, batch_format="pyarrow").materialize()

    df = (
        g.groupby(["g", "doc_id"]).count().groupby("g").count()
    )

    def df_slim(b: pa.Table) -> pa.Table:
        return pa.table({"g": b.column("g"), "df": b.column("count()").cast(pa.int64())})

    joined = _join(g, df.map_batches(df_slim, batch_format="pyarrow"), on="g", how="inner")

    def tallies(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "uniq": pc.cast(pc.equal(b.column("df"), 1), pa.int64()),
            }
        )

    per = grouped_sum(
        joined.map_batches(tallies, batch_format="pyarrow"),
        ["doc_id"],
        {"one": "n_grams", "uniq": "n_unique_grams"},
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_grams").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = b.column("n_unique_grams").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_grams": pa.array(n),
                "n_unique_grams": pa.array(u),
                "novelty_micro": pa.array(u * 1_000_000 // np.maximum(n, 1), pa.int64()),
            }
        )

    return per.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["doc_novelty"] = (
    "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents), "
    "pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i FROM toks WHERE len(l) >= 3), "
    "grams AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, "
    "array_to_string(list_slice(l, i, i + 2), ' ') AS g FROM pos), "
    "df AS (SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g), "
    "per AS (SELECT grams.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
    "CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uniq "
    "FROM grams JOIN df USING (g) GROUP BY grams.doc_id) "
    "SELECT doc_id, n_grams, uniq AS n_unique_grams, "
    "CAST(uniq * 1000000 // greatest(n_grams, 1) AS BIGINT) AS novelty_micro FROM per"
)


def q_pii_scrub_audit(sf_dir: str):
    """SQL-CHECKED scrub-completeness audit: re-run all three PII
    detectors over the SCRUBBED text and certify zero residual matches
    — the idempotence proof a compliance reviewer actually wants
    (scrub counts alone don't show the replacements didn't miss or
    mint new matches).  ONE integer row: docs, per-category scrubbed
    totals, per-category residuals, clean flag."""
    import numpy as np

    scrubbed = q_pii_scrub(sf_dir)

    def fold(b: pa.Table) -> pa.Table:
        clean = b.column("text_clean")
        if isinstance(clean, pa.ChunkedArray):
            clean = clean.combine_chunks()
        r_em = pc.sum(pc.count_substring_regex(clean, PII_EMAIL_RE)).as_py() or 0
        r_ph = pc.sum(pc.count_substring_regex(clean, PII_PHONE_RE)).as_py() or 0
        r_ip = pc.sum(pc.count_substring_regex(clean, PII_IP_RE)).as_py() or 0
        one = lambda v: pa.array([int(v)], pa.int64())  # noqa: E731
        return pa.table(
            {
                "n_docs": one(b.num_rows),
                "scrubbed_emails": one(pc.sum(b.column("n_emails")).as_py() or 0),
                "scrubbed_phones": one(pc.sum(b.column("n_phones")).as_py() or 0),
                "scrubbed_ips": one(pc.sum(b.column("n_ips")).as_py() or 0),
                "residual_emails": one(r_em),
                "residual_phones": one(r_ph),
                "residual_ips": one(r_ip),
            }
        )

    tot = np.zeros(7, np.int64)
    names = [
        "n_docs",
        "scrubbed_emails",
        "scrubbed_phones",
        "scrubbed_ips",
        "residual_emails",
        "residual_phones",
        "residual_ips",
    ]
    for b in scrubbed.map_batches(fold, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i, n in enumerate(names):
            tot[i] += int(pc.sum(b.column(n)).as_py() or 0)
    cols = {n: pa.array([int(tot[i])], pa.int64()) for i, n in enumerate(names)}
    cols["clean"] = pa.array([1 if int(tot[4:].sum()) == 0 else 0], pa.int64())
    return pa.table(cols)


ORACLE_SQL["pii_scrub_audit"] = (
    "WITH p AS ("
    + ORACLE_SQL["pii_scrub"]
    + ") SELECT CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_emails) AS BIGINT) AS scrubbed_emails, "
    "CAST(sum(n_phones) AS BIGINT) AS scrubbed_phones, "
    "CAST(sum(n_ips) AS BIGINT) AS scrubbed_ips, "
    "CAST(sum(len(regexp_extract_all(text_clean, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT) AS residual_emails, "
    "CAST(sum(len(regexp_extract_all(text_clean, '\\b555-[0-9]{4}\\b'))) AS BIGINT) "
    "AS residual_phones, "
    "CAST(sum(len(regexp_extract_all(text_clean, "
    "'\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))) AS BIGINT) AS residual_ips, "
    "CAST(CASE WHEN sum(len(regexp_extract_all(text_clean, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) "
    "+ sum(len(regexp_extract_all(text_clean, '\\b555-[0-9]{4}\\b'))) "
    "+ sum(len(regexp_extract_all(text_clean, "
    "'\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))) = 0 "
    "THEN 1 ELSE 0 END AS BIGINT) AS clean FROM p"
)
