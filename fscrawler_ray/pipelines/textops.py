"""Text-analysis pipelines over the documents table.

Round 2: the integer-valued pieces are SQL-checked — both engines run
RE2, so pyarrow ``count_substring_regex`` and DuckDB
``len(regexp_extract_all(...))`` count identically, and the langid
argmax (first-max-wins over the marker languages) is an exact CASE
cascade. Float scores (quality_score) and the hash sketches stay
rows-only."""

from __future__ import annotations

import pyarrow as pa

import ray

from ..functions.text import (
    _LANG_MARKERS,
    _STOPWORDS_PAT,
    fingerprint64,
    langid_batch,
    quality_features,
    simhash64,
)


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def q_langid_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"), "pred_lang": langid_batch(b.column("text"))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix: the certified langid kernel's
    prediction vs the corpus's labeled ``lang``, counted per (true,
    predicted) pair — the eval layer every lang-filter deployment needs
    before trusting the classifier's per-language attrition.  One
    streaming pass + a lang²-bounded grouped count."""
    from .analytics import grouped_sum

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang_true": b.column("lang"),
                "lang_pred": langid_batch(b.column("text")),
                "one": pa.array([1] * b.num_rows, pa.int64()),
            }
        )

    return grouped_sum(
        ds.map_batches(f, batch_format="pyarrow"),
        ["lang_true", "lang_pred"],
        {"one": "n_docs"},
    )


def q_quality_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        q = quality_features(b.column("text"))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "quality_score": q.column("quality_score"),
                "mean_token_len": q.column("mean_token_len"),
                "punct_ratio": q.column("punct_ratio"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_quality_counts(sf_dir: str):
    """The integer quality components (chars/tokens/punct/stopwords) —
    SQL-checkable because both sides count RE2 matches."""
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        t = b.column("text")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pc.utf8_length(t).cast(pa.int64()),
                "n_tokens": pc.count_substring_regex(t, r"\S+").cast(pa.int64()),
                "n_punct": pc.count_substring_regex(t, r"[^\w\s]").cast(pa.int64()),
                "n_stop": pc.count_substring_regex(pc.utf8_lower(t), _STOPWORDS_PAT).cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def _langid_sql() -> str:
    langs = list(_LANG_MARKERS)
    pats = []
    for lang in langs:
        words = _LANG_MARKERS[lang]
        pats.append("|".join(words) if lang == "zh" else r"\b(" + "|".join(words) + r")\b")
    counts = ", ".join(
        f"len(regexp_extract_all(lower(text), '{p}')) AS c{j}" for j, p in enumerate(pats)
    )
    # first-max-wins argmax, exactly numpy's tie-break in langid_batch
    cases = []
    for j, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"c{j} >= c{k}" for k in range(j + 1, len(langs)))
        cases.append(f"WHEN {conds} THEN '{lang}'")
    zero = " + ".join(f"c{j}" for j in range(len(langs)))
    return (
        f"WITH c AS (SELECT doc_id, {counts} FROM documents) "
        f"SELECT doc_id, CASE WHEN {zero} = 0 THEN 'und' "
        + " ".join(cases)
        + f" ELSE '{langs[-1]}' END AS pred_lang FROM c"
    )


PMI_MIN_COUNT = 5
PMI_K = 50

ORACLE_SQL = {
    "quality_counts": (
        "SELECT doc_id, length(text) AS n_chars, "
        "cast(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
        "cast(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct, "
        f"cast(len(regexp_extract_all(lower(text), '{_STOPWORDS_PAT}')) AS BIGINT) AS n_stop "
        "FROM documents"
    ),
    "langid_docs": _langid_sql(),
    "char_entropy_by_lang": (
        "WITH ch AS (SELECT lang, unnest(regexp_extract_all(text, '[\\s\\S]')) AS c "
        "FROM documents), "
        "g AS (SELECT lang, c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY lang, c), "
        "t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nn FROM g GROUP BY lang) "
        "SELECT g.lang, t.nn AS n_chars, CAST(count(*) AS BIGINT) AS distinct_chars, "
        "CAST(sum(CAST(floor((n / CAST(t.nn AS DOUBLE)) * ln(CAST(t.nn AS DOUBLE) / n) "
        "* 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro "
        "FROM g JOIN t USING (lang) GROUP BY g.lang, t.nn"
    ),
    "zipf_slope": (
        "WITH toks AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents), "
        "c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t), "
        "r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rk FROM c), "
        "xy AS (SELECT CAST(floor(ln(rk) * 1000000) AS HUGEINT) AS x, "
        "CAST(floor(ln(c) * 1000000) AS HUGEINT) AS y FROM r), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy), "
        "f AS (SELECT n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den FROM s) "
        "SELECT CAST(n AS BIGINT) AS vocab, "
        "(SELECT CAST(sum(c) AS BIGINT) FROM c) AS n_tokens, "
        "CAST(CASE WHEN den = 0 THEN 0 ELSE "
        "(num + 10 * den) * 1000 // den - 10000 END AS BIGINT) AS slope_milli FROM f"
    ),
    "vocab_good_turing": (
        "WITH toks AS (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS t "
        "FROM documents), "
        "c AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY lang, t) "
        "SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS vocab, "
        "CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n1, "
        "CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS n2, "
        "CAST(count(*) FILTER (WHERE c = 1) * 1000000 // greatest(sum(c), 1) AS BIGINT) "
        "AS unseen_mass_micro FROM c GROUP BY lang"
    ),
    "langid_confusion": (
        "WITH pred AS (" + _langid_sql() + ") "
        "SELECT d.lang AS lang_true, p.pred_lang AS lang_pred, "
        "CAST(count(*) AS BIGINT) AS n_docs "
        "FROM documents d JOIN pred p ON p.doc_id = d.doc_id "
        "GROUP BY d.lang, p.pred_lang"
    ),
    "fingerprint_canon": (
        "SELECT doc_id, array_to_string(list_sort(list_distinct("
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))), ' ') AS canon "
        "FROM documents"
    ),
    "collocations": (
        "WITH toksl AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents), "
        "uni AS (SELECT unnest(t) AS x FROM toksl), "
        "ucnt AS (SELECT x, count(*) AS c FROM uni GROUP BY x), "
        "n AS (SELECT count(*) AS n FROM uni), "
        "bi AS (SELECT t[i] AS x, t[i + 1] AS y FROM toksl, "
        "unnest(generate_series(1, len(t) - 1)) AS u(i)), "
        "bcnt AS (SELECT x, y, count(*) AS cxy FROM bi GROUP BY x, y), "
        f"p AS (SELECT bcnt.x, bcnt.y, cxy, ux.c AS cx, uy.c AS cy FROM bcnt "
        f"JOIN ucnt ux ON ux.x = bcnt.x JOIN ucnt uy ON uy.x = bcnt.y WHERE cxy >= {PMI_MIN_COUNT}) "
        "SELECT x, y, CAST(cxy AS BIGINT) AS pair_count, "
        "CAST(round(1000000 * (((ln(cxy) + ln(n.n)) - ln(cx)) - ln(cy))) AS BIGINT) AS pmi_micro "
        f"FROM p, n ORDER BY pmi_micro DESC, x, y LIMIT {PMI_K}"
    ),
    "normalize_docs": (
        "WITH n AS (SELECT doc_id, "
        "trim(regexp_replace(nfc_normalize(lower(text)), '\\s+', ' ', 'g')) AS norm_text "
        "FROM documents) "
        "SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm FROM n"
    ),
    "quality_ratios": (
        "WITH c AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars, "
        "CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tokens, "
        "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct, "
        f"CAST(len(regexp_extract_all(lower(text), '{_STOPWORDS_PAT}')) AS DOUBLE) AS n_stop "
        "FROM documents) "
        "SELECT doc_id, (n_chars - (n_tokens - 1.0)) / greatest(n_tokens, 1.0) AS mean_token_len, "
        "n_punct / greatest(n_chars, 1.0) AS punct_ratio, "
        "n_stop / greatest(n_tokens, 1.0) AS stopword_ratio FROM c"
    ),
    # the full composite quality score replayed in SQL: identical RE2
    # counts, identical float expression order (0.4*len + 0.3*gaussian +
    # 0.2*punct + 0.1*stop, rounded to 6 decimals on both sides)
    "quality_docs": (
        "WITH c AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars, "
        "CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tokens, "
        "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct, "
        f"CAST(len(regexp_extract_all(lower(text), '{_STOPWORDS_PAT}')) AS DOUBLE) AS n_stop "
        "FROM documents), "
        "r AS (SELECT doc_id, n_chars, "
        "(n_chars - (n_tokens - 1.0)) / greatest(n_tokens, 1.0) AS mean_token_len, "
        "n_punct / greatest(n_chars, 1.0) AS punct_ratio, "
        "n_stop / greatest(n_tokens, 1.0) AS stopword_ratio FROM c) "
        "SELECT doc_id, round("
        "0.4 * least(n_chars / 500.0, 1.0) "
        "+ 0.3 * exp(-0.5 * ((mean_token_len - 5.0) / 3.0) * ((mean_token_len - 5.0) / 3.0)) "
        "+ 0.2 * least(greatest(1.0 - 4.0 * punct_ratio, 0.0), 1.0) "
        "+ 0.1 * least(stopword_ratio * 5.0, 1.0), 6) AS quality_score, "
        "mean_token_len, punct_ratio FROM r"
    ),
    # the mergeable histogram-sketch median replayed exactly: bin index =
    # min(floor(clip(x, 0, 8192) * 0.5), 4095), then the discrete-quantile
    # bin scan (first bin whose cumulative count reaches floor(q*(n-1))+1)
    # and the bin's upper edge (bin+1)*2.0 — all integer/float arithmetic
    # DuckDB reproduces bit-identically (the HLL-oracle pattern)
    "approx_median_chars_by_lang": (
        "WITH d AS (SELECT lang, least(CAST(floor("
        "least(greatest(CAST(n_chars AS DOUBLE), 0.0), 8192.0) * 0.5) AS BIGINT), 4095) AS b "
        "FROM documents WHERE n_chars IS NOT NULL), "
        "hist AS (SELECT lang, b, count(*) AS c FROM d GROUP BY lang, b), "
        "tot AS (SELECT lang, sum(c) AS n FROM hist GROUP BY lang), "
        "cum AS (SELECT lang, b, sum(c) OVER (PARTITION BY lang ORDER BY b) AS cum FROM hist), "
        "sel AS (SELECT c.lang AS lang, min(c.b) AS bin FROM cum c "
        "JOIN tot t ON c.lang IS NOT DISTINCT FROM t.lang "
        "WHERE c.cum >= floor(0.5 * (t.n - 1)) + 1 GROUP BY c.lang) "
        "SELECT lang, CAST((bin + 1) * 2.0 AS DOUBLE) AS approx_quantile FROM sel"
    ),
}


def q_fingerprint_canon(sf_dir: str):
    """SQL-checkable document fingerprint: the canonical sorted-distinct-
    token string (the winnowing fingerprint's preimage). All Arrow-side:
    split → flatten → one vectorized two-key sort → consecutive dedup →
    rebuild list → binary_join. DuckDB expresses the same thing as
    list_sort(list_distinct(...)) (VERDICT r02 #7)."""
    import numpy as np
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        n = len(b)
        toks = pc.split_pattern_regex(pc.utf8_lower(b.column("text")), r"\s+")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        pairs = pa.table({"doc": pa.array(doc[keep]), "tok": flat.filter(pa.array(keep))})
        pairs = pairs.sort_by([("doc", "ascending"), ("tok", "ascending")])
        d = pairs.column("doc").to_numpy(zero_copy_only=False)
        t = pairs.column("tok").combine_chunks()
        if len(d):
            dup = np.zeros(len(d), dtype=bool)
            dup[1:] = (d[1:] == d[:-1]) & pc.equal(t.slice(1), t.slice(0, len(t) - 1)).to_numpy(
                zero_copy_only=False
            )
            d, t = d[~dup], t.filter(pa.array(~dup))
        counts = np.bincount(d, minlength=n) if len(d) else np.zeros(n, np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), t)
        return pa.table({"doc_id": b.column("doc_id"), "canon": pc.binary_join(lst, " ")})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_quality_ratios(sf_dir: str):
    """The float quality components that ARE bit-exactly SQL-expressible:
    each is one IEEE double division of integer-valued doubles, so DuckDB
    and numpy produce identical bits (unlike quality_score's exp/round)."""

    def f(b: pa.Table) -> pa.Table:
        q = quality_features(b.column("text"))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "mean_token_len": q.column("mean_token_len"),
                "punct_ratio": q.column("punct_ratio"),
                "stopword_ratio": q.column("stopword_ratio"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_simhash_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"), "simhash": pa.array(simhash64(b.column("text")))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_fingerprint_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"), "fingerprint": pa.array(fingerprint64(b.column("text")))}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_top_tokens_approx(sf_dir: str, k: int = 20):
    """Approximate vocabulary heavy hitters (Count-Min + candidate
    union): the scale path for token frequency over a 10^10-doc corpus —
    fixed-size grid partials instead of a token-universe shuffle.  Same
    RE2 tokenizer as the inverted index.  Approximate counts → rows-only
    check; exactness is pytest-bounded (estimates are upper bounds, tight
    on the heavy head)."""
    from ..functions.sketches import heavy_hitters
    from .index_sink import tokenize

    def flat(b: pa.Table) -> pa.Table:
        flat_toks, _, keep = tokenize(b.column("text"))
        return pa.table({"tok": flat_toks.filter(keep)})

    toks = _docs(sf_dir, ["text"]).map_batches(flat, batch_format="pyarrow")
    return heavy_hitters(toks, "tok", k=k)


def q_simhash_md5_docs(sf_dir: str):
    """SQL-replayable SimHash (md5 token hash; the xxh64 ``simhash_docs``
    stays the scale path — same pattern as cms_token_estimates)."""
    from ..functions.text import simhash64_md5

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"), "simhash": pa.array(simhash64_md5(b.column("text")))}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_fingerprint_md5_docs(sf_dir: str):
    """SQL-replayable winnowing fingerprint (min md5 of 3-token shingle
    strings; xxh64 ``fingerprint_docs`` stays the scale path)."""
    from ..functions.text import fingerprint64_md5

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"), "fingerprint": pa.array(fingerprint64_md5(b.column("text")))}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


_WRAP64 = (
    "CAST(CASE WHEN {v} >= 9223372036854775808 THEN CAST({v} AS HUGEINT) - 18446744073709551616 "
    "ELSE CAST({v} AS HUGEINT) END AS BIGINT)"
)

# Gopher rules: every count is RE2 on both sides; every threshold is a
# cross-multiplied integer inequality, so the flags replay bit-for-bit
# Gopher's published list is {the,be,to,of,and,that,have,with}; "be" is
# swapped for "a" so the rule discriminates on this synthetic corpus's
# vocabulary (the ≥2-distinct semantics are unchanged)
GOPHER_STOPWORDS = ("the", "a", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
_GOPHER_STOP_SUM = " + ".join(
    f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END"
    for w in GOPHER_STOPWORDS
)
_GOPHER_COUNTS_CTE = (
    "SELECT doc_id, source, "
    "cast(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words, "
    "length(text) - cast(len(regexp_extract_all(text, '\\s')) AS BIGINT) AS n_wordchars, "
    "cast(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS BIGINT) AS n_sym, "
    "1 + cast(len(regexp_extract_all(text, '\\n')) AS BIGINT) AS n_lines, "
    "cast(len(regexp_extract_all(text, '(?m)^[ \\t]*[•*-]')) AS BIGINT) AS n_bullet, "
    "cast(len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$')) AS BIGINT) AS n_ell, "
    "cast(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT) AS n_alpha_w, "
    f"({_GOPHER_STOP_SUM}) AS n_stop "
    "FROM documents"
)
_GOPHER_FLAGS_CTE = (
    "SELECT doc_id, source, n_words, "
    f"CASE WHEN n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS r_word_count, "
    "CASE WHEN 3 * n_words <= n_wordchars AND n_wordchars <= 10 * n_words THEN 1 ELSE 0 END AS r_mean_len, "
    "CASE WHEN 10 * n_sym <= n_words THEN 1 ELSE 0 END AS r_symbol, "
    "CASE WHEN 10 * n_bullet <= n_lines THEN 1 ELSE 0 END AS r_bullet, "
    "CASE WHEN 10 * n_ell <= 3 * n_lines THEN 1 ELSE 0 END AS r_ellipsis, "
    "CASE WHEN 5 * n_alpha_w >= 4 * n_words THEN 1 ELSE 0 END AS r_alpha, "
    "CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop "
    "FROM c"
)
ORACLE_SQL["gopher_rules"] = (
    f"WITH c AS ({_GOPHER_COUNTS_CTE}), f AS ({_GOPHER_FLAGS_CTE}) "
    "SELECT doc_id, n_words, "
    "CAST(r_word_count AS BIGINT) AS r_word_count, CAST(r_mean_len AS BIGINT) AS r_mean_len, "
    "CAST(r_symbol AS BIGINT) AS r_symbol, CAST(r_bullet AS BIGINT) AS r_bullet, "
    "CAST(r_ellipsis AS BIGINT) AS r_ellipsis, CAST(r_alpha AS BIGINT) AS r_alpha, "
    "CAST(r_stop AS BIGINT) AS r_stop, "
    "CAST(r_word_count * r_mean_len * r_symbol * r_bullet * r_ellipsis * r_alpha * r_stop AS BIGINT) AS gopher_pass "
    "FROM f"
)
ORACLE_SQL["gopher_pass_by_source"] = (
    f"WITH c AS ({_GOPHER_COUNTS_CTE}), f AS ({_GOPHER_FLAGS_CTE}), "
    "p AS (SELECT source, r_word_count * r_mean_len * r_symbol * r_bullet * "
    "r_ellipsis * r_alpha * r_stop AS gpass FROM f) "
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(gpass) AS BIGINT) AS n_pass, "
    "CAST(sum(gpass) * 1000000 // count(*) AS BIGINT) AS pass_rate_micro "
    "FROM p GROUP BY source"
)
ORACLE_SQL["simhash_md5_docs"] = (
    "WITH raw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS s FROM documents), "
    "tk0 AS (SELECT doc_id, s[i] AS tok FROM raw, unnest(generate_series(1, len(s))) AS u(i)), "
    "hh AS (SELECT doc_id, md5_number_upper(tok) AS h FROM tk0 WHERE tok <> ''), "
    "bt AS (SELECT unnest(generate_series(0, 63)) AS b), "
    "acc AS (SELECT doc_id, bt.b AS b, sum(CASE WHEN (h >> bt.b) & 1 = 1 THEN 1 ELSE -1 END) AS sc "
    "FROM hh, bt GROUP BY doc_id, bt.b), "
    "m AS (SELECT doc_id, sum(1::HUGEINT << b) AS v FROM acc WHERE sc > 0 GROUP BY doc_id) "
    "SELECT d.doc_id, "
    + _WRAP64.format(v="COALESCE(m.v, 0)")
    + " AS simhash FROM documents d LEFT JOIN m USING (doc_id)"
)

ORACLE_SQL["fingerprint_md5_docs"] = (
    "WITH raw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS s FROM documents), "
    "tk0 AS (SELECT doc_id, i, s[i] AS tok FROM raw, unnest(generate_series(1, len(s))) AS u(i)), "
    "tk AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j, tok "
    "FROM tk0 WHERE tok <> ''), "
    "sh AS (SELECT doc_id, tok || chr(31) || lead(tok) OVER w || chr(31) || lead(tok, 2) OVER w AS s "
    "FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY j)), "
    "m AS (SELECT doc_id, min(md5_number_upper(s)) AS v FROM sh WHERE s IS NOT NULL GROUP BY doc_id) "
    "SELECT d.doc_id, "
    + _WRAP64.format(v="COALESCE(m.v, 0)")
    + " AS fingerprint FROM documents d LEFT JOIN m USING (doc_id)"
)


def q_cms_token_estimates(sf_dir: str, k: int = 20, width: int = 4096, depth: int = 4):
    """SQL-replayable Count-Min certification (the HLL-oracle pattern for
    the CMS sketch): the md5-chunk grid is folded distributedly (per-block
    partials, driver add-merges depth×width ints), probed at a
    DETERMINISTIC candidate set — the exact top-k tokens by true count
    (cnt desc, token asc) — and DuckDB replays grid + probes
    bit-identically.  Output (token, exact_count, approx_count);
    approx ≥ exact by construction.  The scale path for unknown-universe
    heavy hitters stays q_top_tokens_approx (vectorized xxh64 +
    candidate-union, rows-only)."""
    import numpy as np

    from ..functions.sketches import cms_fold_md5, cms_merge, cms_query_md5
    from .analytics import grouped_sum
    from .index_sink import tokenize

    def flat(b: pa.Table) -> pa.Table:
        flat_toks, _, keep = tokenize(b.column("text"))
        return pa.table({"tok": flat_toks.filter(keep)})

    toks = _docs(sf_dir, ["text"]).map_batches(flat, batch_format="pyarrow")

    # exact candidates: distributed grouped count → per-block partial
    # top-k → driver-final top-k over ≤ blocks×k rows
    def partial(df):
        return df.sort_values(["cnt", "tok"], ascending=[False, True]).head(k)

    counts = grouped_sum(toks, ["tok"], {}, count_out="cnt")
    parts = [
        b
        for b in counts.map_batches(
            lambda b: pa.Table.from_pandas(partial(b.to_pandas()), preserve_index=False),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    cand = (
        pa.concat_tables(parts)
        .to_pandas()
        .sort_values(["cnt", "tok"], ascending=[False, True])
        .head(k)
    )
    cand_toks = pa.array(cand["tok"].tolist(), pa.string())

    def fold(b: pa.Table) -> pa.Table:
        regs = cms_fold_md5(b.column("tok"), width=width, depth=depth)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros((depth, width), dtype=np.int64)
    for b in toks.map_batches(fold, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for buf in b.column("regs").to_pylist():
            merged = cms_merge(merged, np.frombuffer(buf, dtype=np.int64).reshape(depth, width))
    est = cms_query_md5(merged, cand_toks)
    return pa.table(
        {
            "token": cand_toks,
            "exact_count": pa.array(cand["cnt"].to_numpy().astype(np.int64)),
            "approx_count": pa.array(est, pa.int64()),
        }
    )


# the add-alpha bigram LM replayed over raw token strings (the engine's
# 64-bit gram hashes are injective at check scale, so string-keyed counts
# equal hash-keyed counts); per-doc mean log-prob rounded to 6 decimals on
# both sides — the ~1e-16 sum-order drift cannot survive the rounding
# except on measure-zero boundaries
ORACLE_SQL["lm_score_docs"] = (
    "WITH raw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS s FROM documents), "
    "tk0 AS (SELECT doc_id, i, s[i] AS tok FROM raw, unnest(generate_series(1, len(s))) AS u(i)), "
    "tk AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j, tok "
    "FROM tk0 WHERE tok <> ''), "
    "big AS (SELECT doc_id, tok AS t1, lead(tok) OVER (PARTITION BY doc_id ORDER BY j) AS t2 FROM tk), "
    "bp AS (SELECT doc_id, t1, t2 FROM big WHERE t2 IS NOT NULL), "
    "cb AS (SELECT t1, t2, CAST(count(*) AS DOUBLE) AS cb FROM bp GROUP BY t1, t2), "
    "cu AS (SELECT tok AS t1, CAST(count(*) AS DOUBLE) AS cu FROM tk GROUP BY tok), "
    "v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vv FROM tk) "
    "SELECT bp.doc_id, round(avg(ln((cb.cb + 0.1) / (cu.cu + 0.1 * vv))), 6) AS avg_logprob "
    "FROM bp JOIN cb USING (t1, t2) JOIN cu USING (t1), v GROUP BY bp.doc_id"
)

def q_lang_ttr(sf_dir: str):
    """Lexical-diversity profile per language: type count (distinct
    tokens), token count, and hapax count (tokens seen once) — the
    classic type-token-ratio report, kept in exact integers so the
    diversity ratio is computed by the consumer at whatever precision
    they want.  One (lang, token) grouped count (vocab-bounded), then a
    lang-bounded rollup."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["lang", "text"])

    def part(b: pa.Table) -> pa.Table:
        flat, row = _doc_tokens(b)
        langs = b.column("lang").take(pa.array(row, pa.int64()))
        g = pa.TableGroupBy(pa.table({"lang": langs, "tok": flat}), ["lang", "tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"lang": g.column("lang"), "tok": g.column("tok"), "c_p": g.column("count_all")})

    lt = ds.map_batches(part, batch_format="pyarrow").groupby(["lang", "tok"]).aggregate(Sum("c_p"))

    def roll(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        c = b.column("sum(c_p)")
        one = _pc.equal(c, 1).cast(pa.int64())
        g = pa.TableGroupBy(
            pa.table({"lang": b.column("lang"), "t": c, "h": one}), ["lang"]
        ).aggregate([("t", "count"), ("t", "sum"), ("h", "sum")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "types_p": g.column("t_count").cast(pa.int64()),
                "tokens_p": g.column("t_sum").cast(pa.int64()),
                "hapax_p": g.column("h_sum").cast(pa.int64()),
            }
        )

    out = (
        lt.map_batches(roll, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("types_p"), Sum("tokens_p"), Sum("hapax_p"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b.column("lang"),
                "n_types": b.column("sum(types_p)").cast(pa.int64()),
                "n_tokens": b.column("sum(tokens_p)").cast(pa.int64()),
                "n_hapax": b.column("sum(hapax_p)").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["lang_ttr"] = (
    "WITH toks AS (SELECT lang, unnest(list_filter(string_split_regex(text, '\\s+'), "
    "x -> x <> '')) AS tok FROM documents), "
    "lt AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok) "
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax FROM lt GROUP BY lang"
)


def q_doclen_histogram(sf_dir: str):
    """Corpus length profile: docs per power-of-two TOKEN-count bucket
    (bucket = floor(log2(n_tokens)); the standard sanity plot before
    chunk/pack decisions).  floor(log2) of a positive int is bit_length−1
    — pure integer on both sides (DuckDB: length(bin(x))−1).  Zero-token
    docs land in bucket −1.  One streaming count + one tiny groupby."""
    import numpy as np
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["text"])

    def part(b: pa.Table) -> pa.Table:
        n = _pc.count_substring_regex(b.column("text"), r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
        # token counts are small ints: bit_length per UNIQUE count is exact
        u, c = np.unique(n, return_counts=True)
        ub = np.array([(int(x).bit_length() - 1) if x > 0 else -1 for x in u], np.int64)
        t = {}
        for bb, cc in zip(ub, c):
            t[bb] = t.get(bb, 0) + int(cc)
        ks = sorted(t)
        return pa.table(
            {"bucket": pa.array(ks, pa.int64()), "n_p": pa.array([t[k] for k in ks], pa.int64())}
        )

    out = ds.map_batches(part, batch_format="pyarrow").groupby("bucket").aggregate(Sum("n_p"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"bucket": b.column("bucket"), "n_docs": b.column("sum(n_p)").cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["doclen_histogram"] = (
    "WITH n AS (SELECT CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt FROM documents) "
    "SELECT CASE WHEN nt > 0 THEN CAST(length(bin(CAST(nt AS UBIGINT))) - 1 AS BIGINT) ELSE -1 END AS bucket, "
    "CAST(count(*) AS BIGINT) AS n_docs FROM n GROUP BY bucket"
)


def q_source_kl(sf_dir: str):
    """Corpus-mixture diagnostics: per-source KL divergence of the
    source's token distribution from the whole-corpus distribution,
    KL(P_s ‖ P_c) = Σ_t (n_st/N_s)·ln((n_st·N_c)/(N_s·n_ct)) — the
    standard drift/skew check before fixing mixture weights (a source
    whose KL is high is lexically unlike the corpus).  Each term is
    micro-quantized to int64 BEFORE the sum, so per-source totals are
    exact order-free integer sums (the DSIR λ discipline) and DuckDB
    replays term-for-term.  Shapes: one (source, token) grouped count
    (vocab×sources-bounded), one token grouped count broadcast —
    never a corpus-row shuffle."""
    import math

    import numpy as np
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["source", "text"])

    def st_partial(b: pa.Table) -> pa.Table:
        flat, row = _doc_tokens(b)
        src = b.column("source").take(pa.array(row, pa.int64()))
        g = pa.TableGroupBy(pa.table({"source": src, "tok": flat}), ["source", "tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"source": g.column("source"), "tok": g.column("tok"), "c_p": g.column("count_all")}
        )

    st = (
        ds.map_batches(st_partial, batch_format="pyarrow")
        .groupby(["source", "tok"])
        .aggregate(Sum("c_p"))
        .materialize()
    )
    # corpus token counts (vocab-bounded) from the same (source, token) table
    ctok: dict[str, int] = {}
    for b in st.iter_batches(batch_format="pyarrow"):
        for t, c in zip(b.column("tok").to_pylist(), b.column("sum(c_p)").to_pylist()):
            ctok[t] = ctok.get(t, 0) + int(c)
    n_c = sum(ctok.values())
    vocab = pa.array(sorted(ctok), pa.string())
    cvec = np.array([ctok[t] for t in sorted(ctok)], np.int64)
    # per-source totals (sources-bounded)
    ns: dict[str, int] = {}
    for b in st.iter_batches(batch_format="pyarrow"):
        for s, c in zip(b.column("source").to_pylist(), b.column("sum(c_p)").to_pylist()):
            ns[s] = ns.get(s, 0) + int(c)

    def terms(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()), "t_q": pa.array([], pa.int64())})
        pos = _pc.index_in(b.column("tok"), value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        nst = b.column("sum(c_p)").to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = b.column("source").to_pylist()
        t_q = np.empty(len(nst), np.int64)
        for i in range(len(nst)):
            n_s = ns[srcs[i]]
            # mirror DuckDB's BIGINT/BIGINT → cast-both-to-DOUBLE division
            ratio = float(nst[i] * n_c) / float(n_s * int(cvec[pos[i]]))
            v = 1_000_000.0 * ((float(nst[i]) / float(n_s)) * math.log(ratio))
            t_q[i] = int(math.copysign(math.floor(abs(v) + 0.5), v))
        return pa.table({"source": pa.array(srcs, pa.string()), "t_q": pa.array(t_q, pa.int64())})

    out = st.map_batches(terms, batch_format="pyarrow").groupby("source").aggregate(Sum("t_q"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"source": b.column("source"), "kl_micro": b.column("sum(t_q)").cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["source_kl"] = (
    "WITH toks AS (SELECT source, unnest(list_filter(string_split_regex(text, '\\s+'), "
    "x -> x <> '')) AS tok FROM documents), "
    "st AS (SELECT source, tok, count(*) AS nst FROM toks GROUP BY source, tok), "
    "ct AS (SELECT tok, count(*) AS nct FROM toks GROUP BY tok), "
    "ns AS (SELECT source, count(*) AS n_s FROM toks GROUP BY source), "
    "nc AS (SELECT count(*) AS n_c FROM toks), "
    "term AS (SELECT st.source, CAST(round(1000000 * ((nst / n_s) * ln((nst * n_c) / (n_s * nct)))) AS BIGINT) AS t_q "
    "FROM st JOIN ct USING (tok) JOIN ns USING (source), nc) "
    "SELECT source, CAST(sum(t_q) AS BIGINT) AS kl_micro FROM term GROUP BY source"
)


def q_lm_buckets(sf_dir: str):
    """CCNet-style quality bucketing: every scored document lands in the
    head / middle / tail tercile of the corpus by LM score (Wenzek et al.
    2020 — the published recipe keeps 'head', samples 'middle', drops
    'tail').  Tercile = NTILE(3) over (score DESC, doc_id), computed with
    the epoch-shuffle DISTRIBUTED rank (monotone-uint64 float key →
    per-block top-bits histograms → broadcast offsets → bounded bucket
    groups), so no task ever holds the corpus ranking."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    scores = q_lm_score_docs(sf_dir).materialize()
    n = scores.count()
    k = 3
    sz, big = divmod(n, k)

    def f64_desc_key(x: np.ndarray) -> np.ndarray:
        b = np.ascontiguousarray(x, np.float64).view(np.uint64)
        mask = np.where(b >> np.uint64(63) == 1, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0x8000000000000000))
        return ~(b ^ mask)  # bit-flip of the ascending monotone key → descending

    bits = 8
    shift = np.uint64(64 - bits)

    def keyed(b: pa.Table) -> pa.Table:
        ky = f64_desc_key(b.column("avg_logprob").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "ky": pa.array(ky, pa.uint64()),
                "bkt": pa.array((ky >> shift).astype(np.int64)),
            }
        )

    kd = scores.map_batches(keyed, batch_format="pyarrow").materialize()

    def hist(b: pa.Table) -> pa.Table:
        cnt = np.bincount(b.column("bkt").to_numpy(zero_copy_only=False), minlength=1 << bits)
        nz = np.flatnonzero(cnt)
        return pa.table({"bkt": pa.array(nz, pa.int64()), "n": pa.array(cnt[nz], pa.int64())})

    counts = np.zeros(1 << bits, np.int64)
    for t in (
        kd.map_batches(hist, batch_format="pyarrow").groupby("bkt").aggregate(Sum("n"))
    ).iter_batches(batch_format="pyarrow"):
        counts[t.column("bkt").to_numpy(zero_copy_only=False)] = t.column("sum(n)").to_numpy(zero_copy_only=False)
    offsets = np.r_[0, np.cumsum(counts[:-1])]

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["doc_id"].to_numpy(), g["ky"].to_numpy().view(np.uint64)))
        rank = np.empty(len(g), np.int64)
        rank[order] = offsets[int(g["bkt"].iat[0])] + np.arange(len(g))
        # NTILE(k): the first n%k tiles get size sz+1, the rest sz
        cut = big * (sz + 1)
        t = np.where(rank < cut, rank // max(sz + 1, 1), big + (rank - cut) // max(sz, 1))
        lbl = np.array(["head", "middle", "tail"], dtype=object)[np.minimum(t, k - 1)]
        return pd.DataFrame({"doc_id": g["doc_id"], "bucket": lbl})

    return kd.groupby("bkt").map_groups(tile, batch_format="pandas")


ORACLE_SQL["lm_buckets"] = (
    "WITH s AS (" + ORACLE_SQL["lm_score_docs"] + ") "
    "SELECT doc_id, CASE NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id) "
    "WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket FROM s"
)

ORACLE_SQL["cms_token_estimates"] = (
    # grid cells and probe indices both = CAST('0x'||substring(md5(tok),
    # 1+8*d, 8) AS UBIGINT) % width — bit-identical to md5_chunks_batch
    "WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS tok FROM documents), "
    "tk AS (SELECT tok FROM t WHERE tok <> ''), "
    "cand AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20), "
    "d AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS v(dep)), "
    "cells AS (SELECT dep, CAST('0x' || substring(md5(tok), 1 + 8 * dep, 8) AS UBIGINT) % 4096 AS idx, "
    "count(*) AS c FROM tk, d GROUP BY dep, idx), "
    "probes AS (SELECT cand.tok, cand.cnt, dep, "
    "CAST('0x' || substring(md5(cand.tok), 1 + 8 * dep, 8) AS UBIGINT) % 4096 AS idx FROM cand, d) "
    "SELECT p.tok AS token, CAST(min(p.cnt) AS BIGINT) AS exact_count, "
    "CAST(min(c.c) AS BIGINT) AS approx_count "
    "FROM probes p JOIN cells c ON p.dep = c.dep AND p.idx = c.idx GROUP BY p.tok"
)


def q_collocations(sf_dir: str, k: int = PMI_K, min_count: int = PMI_MIN_COUNT):
    """Corpus-wide bigram collocations: top-k adjacent token pairs by
    pointwise mutual information PMI = ln(c_xy·N / (c_x·c_y)) with a
    min-count floor (Church & Hanks 1990), micro-quantized so ranking is
    pure integer+string ordering.  Distributed shape: one bigram-vocab-
    bounded grouped count + one unigram-vocab-bounded grouped count whose
    (token → count) table broadcasts into the scoring pass; the driver
    merges per-block partial top-k candidates only.  ln through math.log
    (libm) so DuckDB's ln quantizes identically."""
    import math

    import numpy as np
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["text"])

    def _tok_flat(b: pa.Table):
        toks = _pc.split_pattern_regex(_pc.utf8_lower(b.column("text")), r"\s+")
        flat = _pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = _pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        m = _pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return np.asarray(flat.filter(pa.array(m)).to_pylist(), dtype=object), doc[m]

    def uni_partial(b: pa.Table) -> pa.Table:
        t, _ = _tok_flat(b)
        u, c = np.unique(t, return_counts=True)
        return pa.table({"x": pa.array(u.tolist(), pa.string()), "c_p": pa.array(c.astype(np.int64))})

    ucnt = ds.map_batches(uni_partial, batch_format="pyarrow").groupby("x").aggregate(Sum("c_p"))
    toks_l: list[str] = []
    cnts_l: list[np.ndarray] = []
    for b in ucnt.iter_batches(batch_format="pyarrow"):
        toks_l.extend(b.column("x").to_pylist())
        cnts_l.append(b.column("sum(c_p)").to_numpy(zero_copy_only=False).astype(np.int64))
    if not toks_l:
        return pa.table(
            {"x": pa.array([], pa.string()), "y": pa.array([], pa.string()),
             "pair_count": pa.array([], pa.int64()), "pmi_micro": pa.array([], pa.int64())}
        )
    ucounts = np.concatenate(cnts_l)
    N = int(ucounts.sum())
    vocab = pa.array(toks_l, pa.string())
    log_n = math.log(N)

    def bi_partial(b: pa.Table) -> pa.Table:
        t, doc = _tok_flat(b)
        if len(t) < 2:
            return pa.table({"x": pa.array([], pa.string()), "y": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        same = np.roll(doc, -1) == doc
        same[-1] = False
        x, y = t[same], np.roll(t, -1)[same]
        # count per (x, y) within the block via a joined key
        key = np.char.add(np.char.add(x.astype(str), "\x1f"), y.astype(str))
        u, idx, c = np.unique(key, return_index=True, return_counts=True)
        return pa.table(
            {
                "x": pa.array(x[idx].tolist(), pa.string()),
                "y": pa.array(y[idx].tolist(), pa.string()),
                "c_p": pa.array(c.astype(np.int64)),
            }
        )

    bcnt = ds.map_batches(bi_partial, batch_format="pyarrow").groupby(["x", "y"]).aggregate(Sum("c_p"))

    def score_topk(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"x": pa.array([], pa.string()), "y": pa.array([], pa.string()),
             "pair_count": pa.array([], pa.int64()), "pmi_micro": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        cxy = b.column("sum(c_p)").to_numpy(zero_copy_only=False).astype(np.int64)
        m = cxy >= min_count
        if not m.any():
            return empty
        b = b.filter(pa.array(m))
        cxy = cxy[m]
        px = _pc.index_in(b.column("x"), value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        py = _pc.index_in(b.column("y"), value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = ucounts[px], ucounts[py]
        pmi = np.empty(len(cxy), np.int64)
        for i in range(len(cxy)):
            v = (((math.log(cxy[i]) + log_n) - math.log(cx[i])) - math.log(cy[i])) * 1_000_000.0
            pmi[i] = int(math.copysign(math.floor(abs(v) + 0.5), v))
        xs = np.asarray(b.column("x").to_pylist(), dtype=object)
        ys = np.asarray(b.column("y").to_pylist(), dtype=object)
        keep = np.lexsort((ys, xs, -pmi))[:k]
        keep = np.sort(keep)
        return pa.table(
            {
                "x": pa.array(xs[keep].tolist(), pa.string()),
                "y": pa.array(ys[keep].tolist(), pa.string()),
                "pair_count": pa.array(cxy[keep], pa.int64()),
                "pmi_micro": pa.array(pmi[keep], pa.int64()),
            }
        )

    cands = bcnt.map_batches(score_topk, batch_format="pyarrow")
    parts = [t for t in cands.iter_batches(batch_format="pyarrow") if t.num_rows]
    if not parts:
        return pa.table(
            {"x": pa.array([], pa.string()), "y": pa.array([], pa.string()),
             "pair_count": pa.array([], pa.int64()), "pmi_micro": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(parts)
    xs = np.asarray(t.column("x").to_pylist(), dtype=object)
    ys = np.asarray(t.column("y").to_pylist(), dtype=object)
    pmi = t.column("pmi_micro").to_numpy(zero_copy_only=False)
    keep = np.lexsort((ys, xs, -pmi))[:k]
    return t.take(pa.array(np.sort(keep)))


def q_normalize_docs(sf_dir: str):
    """Unicode text canonicalization — the standard corpus-prep first
    step: lowercase → NFC normalize → collapse runs of whitespace to one
    space → trim.  NFC runs through Python's unicodedata (one C call per
    row): this build's pyarrow utf8_normalize does NOT canonically
    compose (e + U+0301 stays decomposed), while DuckDB's nfc_normalize
    does — unicodedata matches DuckDB bit-for-bit on composition.  The
    regex collapse is RE2 on both sides and the trim is ASCII-space-only
    to match DuckDB's trim(); output includes the normalized length so
    dedup keys downstream are comparable."""
    import unicodedata

    import pyarrow.compute as _pc

    def f(b: pa.Table) -> pa.Table:
        t = b.column("text")
        low = _pc.utf8_lower(t)
        n = pa.array([unicodedata.normalize("NFC", x) for x in low.to_pylist()], pa.string())
        coll = _pc.utf8_trim(_pc.replace_substring_regex(n, r"\s+", " "), characters=" ")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "norm_text": coll,
                "n_chars_norm": _pc.utf8_length(coll).cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def gopher_flag_batch(text: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Gopher document-quality rules (Rae et al. 2021 §A1.1) as EXACT
    integer comparisons — every threshold is a cross-multiplied integer
    inequality (3·n_words ≤ n_wordchars instead of mean ≥ 3.0), so DuckDB
    replays the flags bit-for-bit with no float drift.  Both engines run
    RE2, so every count is `count_substring_regex` ≡
    `len(regexp_extract_all(...))`.  Rules:

      r_word_count : 50 ≤ n_words ≤ 100000
      r_mean_len   : mean word length in [3, 10]
      r_symbol     : (# + … + ...) per word ≤ 0.1
      r_bullet     : ≥ 90% of lines do NOT start with a bullet
      r_ellipsis   : ≤ 30% of lines end with an ellipsis
      r_alpha      : ≥ 80% of words contain an alphabetic character
      r_stop       : ≥ 2 distinct Gopher stop words present
    """
    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_words = pc.count_substring_regex(text, r"\S+").cast(pa.int64())
    n_ws = pc.count_substring_regex(text, r"\s").cast(pa.int64())
    n_wordchars = pc.subtract(pc.utf8_length(text).cast(pa.int64()), n_ws)
    n_sym = pc.count_substring_regex(text, r"#|…|\.\.\.").cast(pa.int64())
    n_lines = pc.add(pc.count_substring_regex(text, r"\n").cast(pa.int64()), 1)
    n_bullet = pc.count_substring_regex(text, r"(?m)^[ \t]*[•*-]").cast(pa.int64())
    n_ell = pc.count_substring_regex(text, r"(?m)(\.\.\.|…)$").cast(pa.int64())
    n_alpha_w = pc.count_substring_regex(text, r"\S*[A-Za-z]\S*").cast(pa.int64())
    low = pc.utf8_lower(text)
    n_stop = None
    for w in GOPHER_STOPWORDS:
        hit = pc.match_substring_regex(low, rf"\b{w}\b").cast(pa.int64())
        n_stop = hit if n_stop is None else pc.add(n_stop, hit)

    def _flag(b):
        return b.cast(pa.int64())

    r_wc = _flag(
        pc.and_(
            pc.greater_equal(n_words, GOPHER_MIN_WORDS),
            pc.less_equal(n_words, GOPHER_MAX_WORDS),
        )
    )
    r_ml = _flag(
        pc.and_(
            pc.less_equal(pc.multiply(n_words, 3), n_wordchars),
            pc.less_equal(n_wordchars, pc.multiply(n_words, 10)),
        )
    )
    r_sym = _flag(pc.less_equal(pc.multiply(n_sym, 10), n_words))
    r_bul = _flag(pc.less_equal(pc.multiply(n_bullet, 10), n_lines))
    r_ell = _flag(pc.less_equal(pc.multiply(n_ell, 10), pc.multiply(n_lines, 3)))
    r_alp = _flag(pc.greater_equal(pc.multiply(n_alpha_w, 5), pc.multiply(n_words, 4)))
    r_stp = _flag(pc.greater_equal(n_stop, 2))
    gpass = r_wc
    for r in (r_ml, r_sym, r_bul, r_ell, r_alp, r_stp):
        gpass = pc.multiply(gpass, r)
    return pa.table(
        {
            "n_words": n_words,
            "r_word_count": r_wc,
            "r_mean_len": r_ml,
            "r_symbol": r_sym,
            "r_bullet": r_bul,
            "r_ellipsis": r_ell,
            "r_alpha": r_alp,
            "r_stop": r_stp,
            "gopher_pass": gpass,
        }
    )


def q_gopher_rules(sf_dir: str):
    """Per-document Gopher quality-rule flags — one zero-shuffle streaming
    pass (the standard pretraining-corpus quality gate, beside the C4
    rules in corpus.py and the CCNet LM buckets)."""

    def f(b: pa.Table) -> pa.Table:
        flags = gopher_flag_batch(b.column("text"))
        return pa.table({"doc_id": b.column("doc_id"), **{c: flags.column(c) for c in flags.column_names}})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_gopher_pass_by_source(sf_dir: str):
    """Gopher pass-rate rollup per source — per-block integer partials
    before one source-sized groupby (the curation feedback signal: which
    ingestion source is producing junk)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def f(b: pa.Table) -> pa.Table:
        flags = gopher_flag_batch(b.column("text"))
        g = pa.TableGroupBy(
            pa.table(
                {
                    "source": b.column("source"),
                    "n_docs": pa.array([1] * len(b), pa.int64()),
                    "n_pass": flags.column("gopher_pass"),
                }
            ),
            ["source"],
        ).aggregate([("n_docs", "sum"), ("n_pass", "sum")])
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": g.column("n_docs_sum"),
                "n_pass": g.column("n_pass_sum"),
            }
        )

    out = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(f, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs"), Sum("n_pass"))
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "source": b.column("source"),
                "n_docs": b.column("sum(n_docs)"),
                "n_pass": b.column("sum(n_pass)"),
                # int64 // int64: pyarrow divide truncates, and both
                # operands are non-negative, so trunc ≡ floor ≡ DuckDB //
                "pass_rate_micro": pc.divide(
                    pc.multiply(b.column("sum(n_pass)").cast(pa.int64()), 1_000_000),
                    b.column("sum(n_docs)").cast(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_approx_median_chars_by_lang(sf_dir: str):
    """Approximate grouped median via the mergeable histogram sketch —
    the shuffle-free twin of the exact median_chars_by_lang query (value
    error ≤ one bin width; rows-only check, pytest-bounded)."""
    from ..functions.sketches import approx_quantile_by_key

    ds = _docs(sf_dir, ["lang", "n_chars"])
    return approx_quantile_by_key(ds, "lang", "n_chars", 0.5, lo=0.0, hi=8192.0, bins=4096)


def q_props_extract(sf_dir: str):
    """Structured-field extraction from a semi-structured string column
    (the PII-pipeline shape: pull a typed field out of raw text with one
    RE2 kernel — reference analog: the metadata extractors,
    app/processors/metadata_extractor/*). Vectorized
    ``pc.extract_regex``; both engines run RE2, so SQL-checked."""
    import pyarrow.compute as pc

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b.column("props"), r"(?P<k>[0-9]+)")
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_id": b.column("event_id"), "k": k})

    return ev.map_batches(f, batch_format="pyarrow")


def q_props_redact(sf_dir: str):
    """Masking/redaction over a string column (the PII-scrub shape:
    replace every digit run with a placeholder token — on a corpus with
    real PII the patterns would be emails/phones/SSNs; the kernel and its
    scale posture are identical). One streaming vectorized
    ``pc.replace_substring_regex`` — no shuffle, no state."""
    import pyarrow.compute as pc

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def f(b: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(b.column("props"), r"[0-9]+", "[NUM]")
        return pa.table({"event_id": b.column("event_id"), "redacted": red})

    return ev.map_batches(f, batch_format="pyarrow")


ORACLE_SQL["props_extract"] = (
    "SELECT event_id, try_cast(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k FROM events"
)
ORACLE_SQL["props_redact"] = (
    "SELECT event_id, regexp_replace(props, '[0-9]+', '[NUM]', 'g') AS redacted FROM events"
)


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id", chunk_tokens: int = 64, overlap: int = 16):
    """Sliding-window token chunking (sequence prep for training / RAG
    indexing): split each document into windows of ``chunk_tokens``
    whitespace tokens advancing by ``chunk_tokens - overlap``, the last
    window keeping its natural (shorter) length.  Stateless per-row
    expansion — one vectorized map_batches, rows only ever widen by the
    overlap fraction, no shuffle.  Chunk texts are rebuilt with
    single-space joins, so the SQL oracle (list_slice +
    array_to_string over regexp_extract_all) reproduces them exactly."""
    import pyarrow.compute as pc

    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap

    def f(b: pa.Table) -> pa.Table:
        import numpy as np

        nrows = b.num_rows
        ids = b.column(id_col).combine_chunks()
        toks = pc.split_pattern_regex(b.column(text_col), r"\s+")
        # a null text yields a null list: zero tokens -> zero chunks
        # (fill BEFORE to_numpy — NaN.astype(int64) is undefined)
        lens = (
            pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        keep = pc.invert(pc.equal(flat, ""))
        keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
        row = np.repeat(np.arange(nrows, dtype=np.int64), lens)[keep_np]
        flat_kept = flat.filter(keep)
        n = np.bincount(row, minlength=nrows)
        base = np.concatenate([[0], np.cumsum(n)[:-1]])

        nc = np.where(n == 0, 0, np.where(n <= overlap, 1, -(-(n - overlap) // stride)))
        # per-chunk doc index / chunk ordinal
        doc_idx = np.repeat(np.arange(nrows, dtype=np.int64), nc)
        chunk_id = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nc)[:-1]]), nc
        )
        starts = base[doc_idx] + chunk_id * stride
        clen = np.minimum(chunk_tokens, n[doc_idx] - chunk_id * stride)
        # gather the (overlapping) token ranges, then join per chunk
        out_off = np.concatenate([[0], np.cumsum(clen)])
        gather = (
            np.arange(out_off[-1], dtype=np.int64)
            - np.repeat(out_off[:-1], clen)
            + np.repeat(starts, clen)
        )
        values = flat_kept.take(pa.array(gather, pa.int64()))
        chunks = pa.ListArray.from_arrays(pa.array(out_off, pa.int32()), values)
        texts = pc.binary_join(chunks, " ")
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_idx, pa.int64())),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "chunk_text": texts,
                "chunk_tokens": pa.array(clen, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_chunk_docs(sf_dir: str):
    return chunk_documents(_docs(sf_dir, ["doc_id", "text"]))


ORACLE_SQL["chunk_docs"] = (
    "WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, len(toks) AS n, CASE WHEN len(toks)=0 THEN 0 "
    "WHEN len(toks)<=16 THEN 1 ELSE cast(ceil((len(toks)-16)/48.0) AS BIGINT) END AS nc FROM t), "
    "e AS (SELECT doc_id, toks, n, unnest(range(nc)) AS i FROM c) "
    "SELECT doc_id, cast(i AS BIGINT) AS chunk_id, "
    "array_to_string(list_slice(toks, i*48+1, least(i*48+64, n)), ' ') AS chunk_text, "
    "cast(least(64, n - i*48) AS BIGINT) AS chunk_tokens FROM e"
)


# ---------------------------------------------------------------------------
# tokenizer-prep: exact vocabulary construction + coverage encoding
# ---------------------------------------------------------------------------


def _doc_tokens(b: pa.Table):
    """(flat token strings, doc row index, per-row counts) with the
    oracle's regexp_extract_all('\\S+') semantics: split on whitespace,
    drop empties, null text → zero tokens."""
    import numpy as np
    import pyarrow.compute as pc

    text = b.column("text")
    toks = pc.split_pattern_regex(text, r"\s+")
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).combine_chunks()
    keep = pc.invert(pc.equal(flat, ""))
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    row = np.repeat(np.arange(len(b), dtype=np.int64), lens)[keep_np]
    return flat.filter(keep), row


def build_vocab(ds, n_vocab: int) -> pa.Array:
    """Exact top-N token vocabulary by global count, ties broken token-asc
    (fully deterministic, matching ORDER BY cnt DESC, tok).  Per-batch
    counts partial-aggregate before the token-keyed grouped sum (only
    DISTINCT tokens per block shuffle), and the top-N happens inside the
    Dataset (sort + limit) — the driver receives exactly N rows."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _doc_tokens(b)
        g = pa.TableGroupBy(pa.table({"tok": flat}), ["tok"]).aggregate([([], "count_all")])
        return pa.table({"tok": g.column("tok"), "c_p": g.column("count_all")})

    from ray.data.aggregate import Sum

    cnt = ds.map_batches(partial, batch_format="pyarrow").groupby("tok").aggregate(Sum("c_p"))
    top = cnt.sort(["sum(c_p)", "tok"], descending=[True, False]).limit(n_vocab)
    parts = [b.column("tok") for b in top.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return pa.array([], pa.string())
    return pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])


def q_vocab_coverage(sf_dir: str, n_vocab: int = 25):
    """Per-document tokenizer coverage against the exact top-N vocabulary:
    (doc_id, in_vocab, oov).  The vocabulary broadcasts once and
    membership is pyarrow ``is_in`` — exact string comparison, no hash
    approximation."""
    import numpy as np
    import pyarrow.compute as pc

    vocab = build_vocab(_docs(sf_dir, ["text"]), n_vocab)
    vocab_ref = ray.put(vocab)

    def cover(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        flat, row = _doc_tokens(b)
        inv = pc.is_in(flat, value_set=v).to_numpy(zero_copy_only=False).astype(bool)
        n_in = np.bincount(row[inv], minlength=b.num_rows)
        n_out = np.bincount(row[~inv], minlength=b.num_rows)
        # zero-token docs are ABSENT from the oracle (its unnest emits no
        # row to group) — drop them here too so parity holds on corpora
        # with empty/whitespace-only/null text
        sel = np.flatnonzero(n_in + n_out > 0)
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(pa.array(sel, pa.int64())),
                "in_vocab": pa.array(n_in[sel], pa.int64()),
                "oov": pa.array(n_out[sel], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(cover, batch_format="pyarrow")


ORACLE_SQL["vocab_coverage"] = (
    "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents), "
    "vocab AS (SELECT tok FROM toks GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 25) "
    "SELECT doc_id, "
    "CAST(count(*) FILTER (tok IN (SELECT tok FROM vocab)) AS BIGINT) AS in_vocab, "
    "CAST(count(*) FILTER (tok NOT IN (SELECT tok FROM vocab)) AS BIGINT) AS oov "
    "FROM toks GROUP BY doc_id"
)


# ---------------------------------------------------------------------------
# sequence packing: greedy token-budget bins via a two-level prefix scan
# ---------------------------------------------------------------------------


def pack_by_budget(slim, value_col: str, budget: int, order_cols: list[str], emit_prefix: bool = False):
    """Greedy sequential packing: rows in global ``order_cols`` order go
    into ``budget``-sized bins, bin = floor(exclusive-prefix / budget).
    The global prefix sum is the classic two-level scan: per-``rng``
    totals (grouped sum, range-table-sized) → driver-side exclusive
    cumsum over ranges → broadcast offsets → per-range in-group cumsum.
    ``slim`` must carry order_cols + value_col + an ``rng`` column whose
    ordering matches order_cols' leading key; callers materialize slim
    (it is consumed by BOTH the totals pass and the packing groupby).
    ``emit_prefix=True`` additionally outputs the exclusive global byte
    prefix per row (the CDX offset primitive)."""
    import numpy as np
    import pandas as pd

    from .analytics import grouped_sum

    totals = grouped_sum(slim, ["rng"], {value_col: "tot"}).to_pandas().sort_values("rng")
    offs = dict(
        zip(totals["rng"], np.concatenate([[0], totals["tot"].cumsum().to_numpy()[:-1]]))
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols)
        n = g[value_col].to_numpy()
        prefix = int(offs[g["rng"].iloc[0]]) + np.concatenate([[0], np.cumsum(n)[:-1]])
        out = {c: g[c].to_numpy() for c in order_cols}
        out[value_col] = n
        out["bin"] = (prefix // budget).astype(np.int64)
        if emit_prefix:
            out["prefix"] = prefix.astype(np.int64)
        return pd.DataFrame(out)

    return slim.groupby("rng").map_groups(pack, batch_format="pandas")


def pack_by_budget_keyed(slim, value_col: str, budget: int, order_cols: list[str], key: str):
    """``pack_by_budget`` with a PARTITION key: every ``key`` value gets
    its own independent budget-packed bin sequence (the aspect-bucketed
    shard layout), in the SAME two dataset executions — one
    (key, rng)-grouped totals pass, one (key, rng)-grouped packing pass
    with per-(key, rng) exclusive offsets broadcast from the driver (the
    offset table is (keys × ranges)-bounded)."""
    import numpy as np
    import pandas as pd

    from .analytics import grouped_sum

    totals = (
        grouped_sum(slim, [key, "rng"], {value_col: "tot"})
        .to_pandas()
        .sort_values([key, "rng"])
    )
    offs: dict = {}
    for k, g in totals.groupby(key, sort=False):
        cums = np.concatenate([[0], g["tot"].cumsum().to_numpy()[:-1]])
        for r, o in zip(g["rng"], cums):
            offs[(k, r)] = int(o)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols)
        n = g[value_col].to_numpy()
        prefix = offs[(g[key].iloc[0], g["rng"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(n)[:-1]]
        )
        out = {c: g[c].to_numpy() for c in order_cols}
        if key not in out:
            out[key] = g[key].to_numpy()
        out[value_col] = n
        out["bin"] = (prefix // budget).astype(np.int64)
        return pd.DataFrame(out)

    return slim.groupby([key, "rng"]).map_groups(pack, batch_format="pandas")


def q_pack_sequences(sf_dir: str, budget: int = 512, range_width: int = 64):
    """Greedy sequential packing for LM training batches: documents in
    doc_id order go into token-budget bins via ``pack_by_budget``.  No
    global sort, no driver-side doc loop; group size is bounded by
    range_width."""
    import numpy as np
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        # '\S+' token counts: _doc_tokens drops the empty pieces a bare
        # whitespace split would count
        flat, row = _doc_tokens(b)
        cnt = np.bincount(row, minlength=b.num_rows)
        d = b.column("doc_id").cast(pa.int64())
        return pa.table(
            {
                "doc_id": d,
                "n_tokens": pa.array(cnt, pa.int64()),
                "rng": pc.divide(d, range_width),
            }
        )

    slim = ds.map_batches(prep, batch_format="pyarrow").materialize()
    packed = pack_by_budget(slim, "n_tokens", budget, ["doc_id"])
    return packed.map_batches(lambda b: b.select(["doc_id", "bin"]), batch_format="pyarrow")


ORACLE_SQL["pack_sequences"] = (
    "SELECT doc_id, CAST(floor(coalesce(sum(len(regexp_extract_all(text, '\\S+'))) OVER "
    "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS bin "
    "FROM documents"
)


# ---------------------------------------------------------------------------
# CCNet-style n-gram LM quality scoring
# ---------------------------------------------------------------------------


def _combine_bigrams(h, row):
    """Order-sensitive in-document bigram hash combine shared by the LM
    train and score passes (they MUST stay in sync): (bigram_hash,
    first_token_hash, doc_row) for every adjacent same-doc token pair."""
    import numpy as np

    same = row[1:] == row[:-1]
    first = h[:-1][same]
    bg = (first.view(np.uint64) * np.uint64(1099511628211) + h[1:][same].view(np.uint64)).view(np.int64)
    return bg, first, row[:-1][same]


def _sorted_lookup(keys_sorted, probe, values, default=0.0):
    """Vectorized exact-match lookup into a sorted key array (the repo's
    clamp-and-compare searchsorted probe), empty-table-safe."""
    import numpy as np

    if len(keys_sorted) == 0:
        return np.full(len(probe), default)
    i = np.minimum(np.searchsorted(keys_sorted, probe), len(keys_sorted) - 1)
    return np.where(keys_sorted[i] == probe, values[i], default)


def q_lm_score_docs(sf_dir: str, alpha: float = 0.1):
    """Per-document average bigram log-probability under a corpus-trained
    add-alpha bigram LM — the published CCNet/KenLM quality-filter shape
    (docs scoring far below the corpus mean read as junk).

    Train pass: bigram and unigram counts via the same partial-aggregated
    grouped sums as build_vocab (distinct grams per block shuffle, never
    text).  The model (two count tables, vocabulary-sized) broadcasts
    once; scoring is one streaming map_batches with a vectorized
    searchsorted lookup.  The tokenized input is materialized so train
    and score consume the SAME snapshot (and tokenize once).  Float log
    output → rows-only check; driver-equivalence is pytest-bounded."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import xxh64_batch

    # one materialized read: train and score see the same snapshot and the
    # parquet decode happens once (the review-fix convention)
    ds = _docs(sf_dir, ["doc_id", "text"]).materialize()

    def counts(b: pa.Table) -> pa.Table:
        flat, row = _doc_tokens(b)
        h = xxh64_batch(flat, seed=7).view(np.int64)
        if len(h) == 0:
            return pa.table({"gram": pa.array([], pa.int64()), "c_p": pa.array([], pa.int64()), "kind": pa.array([], pa.int32())})
        gu, cu = np.unique(h, return_counts=True)
        bg, _, _ = _combine_bigrams(h, row)
        gb, cb = np.unique(bg, return_counts=True)
        return pa.table(
            {
                "gram": pa.array(np.concatenate([gu, gb]), pa.int64()),
                "c_p": pa.array(np.concatenate([cu, cb]), pa.int64()),
                "kind": pa.array(np.concatenate([np.zeros(len(gu), np.int32), np.ones(len(gb), np.int32)])),
            }
        )

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(["kind", "gram"]).aggregate(Sum("c_p"))
    uni_g, uni_c, bi_g, bi_c = [], [], [], []
    for b in agg.iter_batches(batch_format="pyarrow"):
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        g = b.column("gram").to_numpy(zero_copy_only=False)
        c = b.column("sum(c_p)").to_numpy(zero_copy_only=False)
        uni_g.append(g[kind == 0]); uni_c.append(c[kind == 0])
        bi_g.append(g[kind == 1]); bi_c.append(c[kind == 1])
    uni_g = np.concatenate(uni_g) if uni_g else np.empty(0, np.int64)
    uni_c = np.concatenate(uni_c) if uni_c else np.empty(0, np.int64)
    bi_g = np.concatenate(bi_g) if bi_g else np.empty(0, np.int64)
    bi_c = np.concatenate(bi_c) if bi_c else np.empty(0, np.int64)
    o = np.argsort(uni_g); uni_g, uni_c = uni_g[o], uni_c[o]
    o = np.argsort(bi_g); bi_g, bi_c = bi_g[o], bi_c[o]
    n_vocab = max(1, len(uni_g))
    model = ray.put((uni_g, uni_c.astype(np.float64), bi_g, bi_c.astype(np.float64), n_vocab))

    def score(b: pa.Table) -> pa.Table:
        ug, uc, bg_keys, bc, V = ray.get(model)
        flat, row = _doc_tokens(b)
        h = xxh64_batch(flat, seed=7).view(np.int64)
        out = np.full(b.num_rows, np.nan)
        if len(h):
            bg, first, brow = _combine_bigrams(h, row)
            # P(w2|w1) = (c(w1 w2) + a) / (c(w1) + a*V)
            bi_cnt = _sorted_lookup(bg_keys, bg, bc)
            u_cnt = _sorted_lookup(ug, first, uc)
            lp = np.log((bi_cnt + alpha) / (u_cnt + alpha * V))
            sums = np.bincount(brow, weights=lp, minlength=b.num_rows)
            cnts = np.bincount(brow, minlength=b.num_rows)
            ok = cnts > 0
            out[ok] = sums[ok] / cnts[ok]
        sel = np.flatnonzero(~np.isnan(out))
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(pa.array(sel, pa.int64())),
                "avg_logprob": pa.array(np.round(out[sel], 6), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q_top_tokens_by_lang(sf_dir: str, k: int = 3):
    """Exact per-language top-k tokens — the grouped heavy-hitter report
    (the EXACT twin of q_top_tokens_approx's CMS sketch).  Per-batch
    (lang, tok) count partials collapse before the token-keyed grouped
    sum; a per-block partial top-k then prunes the count table to
    ≤ k·langs rows per block, so the final per-language selection never
    sees the vocabulary, let alone the corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, row = _doc_tokens(b)
        langs = b.column("lang").take(pa.array(row, pa.int64()))
        g = pa.TableGroupBy(pa.table({"lang": langs, "tok": flat}), ["lang", "tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"lang": g.column("lang"), "tok": g.column("tok"), "c_p": g.column("count_all")})

    cnt = ds.map_batches(partial, batch_format="pyarrow").groupby(["lang", "tok"]).aggregate(Sum("c_p"))

    def prune(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        from .sampling import block_group_topk

        c = b.column("sum(c_p)").to_numpy(zero_copy_only=False).astype(np.int64)
        enc = b.column("lang").combine_chunks().dictionary_encode()
        codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = np.asarray(b.column("tok").to_pylist())
        keep = block_group_topk(codes, (toks, -c), k)
        return b.take(pa.array(keep))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        c = g["sum(c_p)"].to_numpy().astype(np.int64)
        toks = g["tok"].to_numpy()
        order = np.lexsort((toks, -c))[:k]
        out = g.iloc[order].copy()
        out["cnt"] = out["sum(c_p)"].astype(np.int64)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[["lang", "tok", "cnt", "rnk"]]

    return cnt.map_batches(prune, batch_format="pyarrow").groupby("lang").map_groups(
        final, batch_format="pandas"
    )


ORACLE_SQL["top_tokens_by_lang"] = (
    "WITH t AS (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents), "
    "c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY 1, 2), "
    "r AS (SELECT lang, tok, cnt, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rnk FROM c) "
    "SELECT lang, tok, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3"
)


VOCAB_GROWTH_BUCKET = 32  # docs per growth bucket (sized to the report)


def q_vocab_good_turing(sf_dir: str):
    """Per-language Good–Turing corpus statistics (Gale & Sampson 1995
    simple GT): token total N, vocabulary size, hapax/dis legomena
    counts (n1, n2) and the unseen-probability mass n1·10⁶ // N in
    integer micros — the "how much of the language haven't we crawled
    yet" signal that drives corpus-growth decisions.  Two grouped
    passes: (lang, token) counts (vocab-bounded output), then a
    lang-keyed fold of frequency-of-frequency indicators."""
    import numpy as np
    import pyarrow.compute as pc

    from .analytics import grouped_sum

    ds = _docs(sf_dir, ["lang", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        flat, row = _doc_tokens(b)
        lang = b.column("lang").take(pa.array(row, pa.int64()))
        return pa.table(
            {"lang": lang, "token": flat, "one": pa.array(np.ones(len(flat), np.int64))}
        )

    counts = grouped_sum(
        ds.map_batches(pairs, batch_format="pyarrow"), ["lang", "token"], {"one": "c"}
    )

    def ind(b: pa.Table) -> pa.Table:
        c = b.column("c").cast(pa.int64())
        one = pa.array(np.ones(b.num_rows, np.int64))
        return pa.table(
            {
                "lang": b.column("lang"),
                "c": c,
                "v": one,
                "i1": pc.cast(pc.equal(c, 1), pa.int64()),
                "i2": pc.cast(pc.equal(c, 2), pa.int64()),
            }
        )

    g = grouped_sum(
        counts.map_batches(ind, batch_format="pyarrow"),
        ["lang"],
        {"c": "n_tokens", "v": "vocab", "i1": "n1", "i2": "n2"},
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_tokens").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n1 = b.column("n1").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": b.column("lang"),
                "n_tokens": pa.array(n, pa.int64()),
                "vocab": b.column("vocab").cast(pa.int64()),
                "n1": pa.array(n1, pa.int64()),
                "n2": b.column("n2").cast(pa.int64()),
                "unseen_mass_micro": pa.array(
                    n1 * 1_000_000 // np.maximum(n, 1), pa.int64()
                ),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


def q_vocab_growth(sf_dir: str, bucket: int = VOCAB_GROWTH_BUCKET):
    """Heaps'-law vocabulary-growth curve — the corpus statistic that
    sizes tokenizer vocabularies and dedup sketch widths: per doc-id
    bucket, how many NEVER-BEFORE-SEEN words appear, plus the running
    vocabulary size.  First occurrence = min(doc_id) per word (one
    vocab-bounded groupby after per-block partial minima); the bucket
    rollup and cumulative sum are bucket-table-sized driver folds.  A
    production run picks ``bucket`` to bound the report size."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        toks = pc.split_pattern_regex(pc.ascii_lower(b.column("text")), "[^a-z]+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype("int64")
        flat = pc.list_flatten(toks)
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        did = np.repeat(
            b.column("doc_id").to_numpy(zero_copy_only=False).astype("int64"), lens
        )[keep]
        words = flat.to_pandas().to_numpy()[keep]
        if not len(words):
            return pa.table({"word": pa.array([], pa.string()), "first_doc": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": words, "d": did}).groupby("w", sort=False)["d"].min()
        return pa.table(
            {"word": pa.array(df.index.to_numpy(), pa.string()), "first_doc": pa.array(df.to_numpy(), pa.int64())}
        )

    firsts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Min("first_doc"))
    )

    def buckets(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("min(first_doc)").to_numpy(zero_copy_only=False).astype("int64")
        bk = d // bucket
        u, c = np.unique(bk, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()), "nw": pa.array(c.astype("int64"))})

    import numpy as np

    agg: dict[int, int] = {}
    for t in firsts.map_batches(buckets, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k, v in zip(t.column("bucket").to_pylist(), t.column("nw").to_pylist()):
            agg[k] = agg.get(k, 0) + v
    ks = sorted(agg)
    cum = np.cumsum([agg[k] for k in ks]).astype("int64")
    return pa.table(
        {
            "bucket": pa.array(ks, pa.int64()),
            "new_words": pa.array([agg[k] for k in ks], pa.int64()),
            "cum_words": pa.array(cum),
        }
    )


ORACLE_SQL["vocab_growth"] = (
    "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word "
    "FROM documents), "
    "f AS (SELECT word, min(doc_id) AS d FROM w WHERE word <> '' GROUP BY word), "
    f"b AS (SELECT d // {VOCAB_GROWTH_BUCKET} AS bucket, CAST(count(*) AS BIGINT) AS new_words "
    "FROM f GROUP BY 1) "
    "SELECT CAST(bucket AS BIGINT) AS bucket, new_words, "
    "CAST(sum(new_words) OVER (ORDER BY bucket) AS BIGINT) AS cum_words FROM b"
)


def q_corpus_datacard(sf_dir: str):
    """Per-language corpus data card — the one-table release summary a
    dataset ships with (doc counts, char/token totals, exact-dup tallies,
    median length).  Composes the engine's scale primitives into a single
    SQL-CHECKED report:

    - counts/sums: ONE streaming pass of per-block (lang) partials
      (pyarrow hash aggregation) folded by a lang-keyed grouped sum;
      token totals ride the same pass via a vectorized \\S+ match count
      (the regexp_extract_all twin — no flatten, no Python loop);
    - distinct texts: per-block (lang, md5-u64) dedup, one hash-keyed
      groupby, then a lang-keyed grouped count — count(distinct) without
      ever shuffling raw text (md5_number_upper replayable in DuckDB);
    - median chars: the exact grouped-quantile histogram pass (q = 1/2,
      dyadic → float-exact in both engines).

    Driver state is lang-bounded (a few rows per table); the corpus
    never leaves the cluster.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.quantiles import grouped_quantile_disc
    from ..functions.sketches import md5_u64_batch

    ds = _docs(sf_dir, ["lang", "text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(b.column("text"), r"\S+").cast(pa.int64())
        t = pa.table({"lang": b.column("lang"), "nc": b.column("n_chars"), "tk": toks})
        g = pa.TableGroupBy(t, ["lang"]).aggregate([("nc", "sum"), ("tk", "sum"), ([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "nc_p": g.column("nc_sum"),
                "tk_p": g.column("tk_sum"),
                "n_p": g.column("count_all"),
            }
        )

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("nc_p"), Sum("tk_p"), Sum("n_p"))
        .to_pandas()
    )

    def hkey(b: pa.Table) -> pa.Table:
        h = md5_u64_batch(b.column("text"))
        t = pa.table({"lang": b.column("lang"), "h": pa.array(h)})
        return pa.TableGroupBy(t, ["lang", "h"]).aggregate([])  # block-local distinct

    def cpart(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["lang"]), ["lang"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"), "c_p": g.column("count_all")})

    dist = (
        ds.map_batches(hkey, batch_format="pyarrow")
        .groupby(["lang", "h"])
        .count()
        .map_batches(cpart, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("c_p"))
        .to_pandas()
    )

    p50 = grouped_quantile_disc(ds, "lang", "n_chars", 1, 2, out="p50").to_pandas()

    m = sums.merge(dist, on="lang").merge(p50, on="lang").sort_values("lang")
    n = m["sum(n_p)"].to_numpy().astype(np.int64)
    chars = m["sum(nc_p)"].to_numpy().astype(np.int64)
    distinct = m["sum(c_p)"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "lang": pa.array(m["lang"]),
            "n_docs": pa.array(n, pa.int64()),
            "total_chars": pa.array(chars, pa.int64()),
            "mean_chars": pa.array(chars // n, pa.int64()),
            "total_tokens": pa.array(m["sum(tk_p)"].to_numpy().astype(np.int64), pa.int64()),
            "distinct_texts": pa.array(distinct, pa.int64()),
            "dup_docs": pa.array(n - distinct, pa.int64()),
            "p50_chars": pa.array(m["p50"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


ORACLE_SQL["corpus_datacard"] = (
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
    "CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars, "
    "CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens, "
    "CAST(count(DISTINCT md5_number_upper(text)) AS BIGINT) AS distinct_texts, "
    "CAST(count(*) - count(DISTINCT md5_number_upper(text)) AS BIGINT) AS dup_docs, "
    "CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars "
    "FROM documents GROUP BY lang"
)


def q_char_entropy_by_lang(sf_dir: str):
    """Order-0 character entropy per language in integer micro-nats —
    the compressibility / encoding-density estimate a corpus release
    reports beside token stats (and the quick sanity check that a
    'language' split isn't actually mixed scripts).  Per-char terms are
    floor-quantized micro-nats summed as exact integers (the psi_drift
    float-log discipline), so DuckDB replays the total bit-for-bit.

    Shape: per-block char-count partials (one C-level join + bincount
    per (block, lang) — never a per-char Python loop), folded by a
    (lang, char)-keyed grouped sum (≤ langs × 256 rows); the entropy
    arithmetic runs on that bounded table."""
    import numpy as np
    import pyarrow.compute as pc

    from .analytics import grouped_sum

    ds = _docs(sf_dir, ["lang", "text"])

    def counts(b: pa.Table) -> pa.Table:
        langs_arr = b.column("lang").to_pylist()
        texts = b.column("text").to_pylist()
        out_lang, out_char, out_n = [], [], []
        by_lang: dict = {}
        for lg, tx in zip(langs_arr, texts):
            if tx:
                by_lang.setdefault(lg, []).append(tx)
        for lg, txs in by_lang.items():
            raw = np.frombuffer("".join(txs).encode(), dtype=np.uint8)
            cnt = np.bincount(raw, minlength=256)
            nz = np.nonzero(cnt)[0]
            out_lang.extend([lg] * len(nz))
            out_char.extend(chr(c) for c in nz)
            out_n.extend(int(cnt[c]) for c in nz)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "char": pa.array(out_char, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    g = grouped_sum(
        ds.map_batches(counts, batch_format="pyarrow"), ["lang", "char"], {"n": "n"}
    ).to_pandas()  # ≤ langs × 256 rows

    rows = []
    for lg, gg in g.groupby("lang"):
        n = gg["n"].to_numpy().astype(np.int64)
        N = int(n.sum())
        terms = np.floor((n / N) * np.log(N / n) * 1e6 + 0.5).astype(np.int64)
        rows.append((lg, N, len(n), int(terms.sum())))
    rows.sort()
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([r[1] for r in rows], pa.int64()),
            "distinct_chars": pa.array([r[2] for r in rows], pa.int64()),
            "entropy_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def q_zipf_slope(sf_dir: str):
    """Zipf-law exponent of the corpus token distribution: least-squares
    slope of floor-quantized (ln rank, ln count) micro-nat pairs over
    the full vocabulary — the one-number language-health check (natural
    text sits near −1; token salad or boilerplate floods bend it).

    Integer discipline end-to-end: x = floor(ln(rank)·10⁶), y =
    floor(ln(count)·10⁶) (the psi_drift float-log convention — both
    engines call the same libm), all four regression sums are exact
    integers, and the slope ships as slope_milli via the offset trick
    (+10 per unit keeps the big-int division nonnegative, so DuckDB
    trunc ≡ Python floor).  Ranks order by (count DESC, token) —
    deterministic ROW_NUMBER twin.  The distributed part is the vocab
    grouped count; the regression runs on the vocab-bounded table."""
    import math

    import numpy as np
    import pyarrow.compute as pc

    from .analytics import grouped_sum

    ds = _docs(sf_dir, ["text"])

    def toks(b: pa.Table) -> pa.Table:
        flat, _ = _doc_tokens(b)
        return pa.table(
            {"token": flat, "one": pa.array(np.ones(len(flat), np.int64))}
        )

    g = grouped_sum(
        ds.map_batches(toks, batch_format="pyarrow"), ["token"], {"one": "c"}
    ).to_pandas()  # vocab-bounded
    g = g.sort_values(["c", "token"], ascending=[False, True]).reset_index(drop=True)
    n = len(g)
    ranks = np.arange(1, n + 1)
    cnts = g["c"].astype(int).to_numpy()
    x = np.floor(np.log(ranks) * 1e6).astype(np.int64)
    y = np.floor(np.log(cnts) * 1e6).astype(np.int64)
    sx = int(x.sum())
    sy = int(y.sum())
    sxy = int((x.astype(object) * y).sum())
    sxx = int((x.astype(object) * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_milli = ((num + 10 * den) * 1000 // den - 10_000) if den else 0
    return pa.table(
        {
            "vocab": pa.array([n], pa.int64()),
            "n_tokens": pa.array([int(cnts.sum())], pa.int64()),
            "slope_milli": pa.array([slope_milli], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# readability: integer-exact Flesch-Kincaid grade


_FK_WORD_RE = r"[A-Za-z]+"
_FK_SENT_RE = r"[.!?]+"
_FK_VOWEL_RE = r"[AEIOUYaeiouy]+"
_FK_NOVOWEL_RE = r"\b[bcdfghj-np-tv-xzBCDFGHJ-NP-TV-XZ]+\b"


def q_readability_docs(sf_dir: str):
    """Per-document Flesch-Kincaid grade level in integer MICROS — the
    classic readability quality signal (used beside Gopher rules to
    catch keyword-stuffed / machine-generated pages whose grade level
    is implausibly low or high).

    Every input to the formula is a count of non-overlapping RE2
    matches over the raw text — words ``[A-Za-z]+``, sentence
    terminators ``[.!?]+`` (floored at 1), vowel groups (the standard
    syllable heuristic) plus one syllable for each vowel-less word —
    and the engine and DuckDB run the SAME patterns through the SAME
    regex engine (Arrow's count_substring_regex and DuckDB's
    regexp_extract_all are both RE2), so counts agree bit-for-bit.

        grade_micro = trunc((390000·W² + 11800000·S·T − 15590000·T·W)
                            / (T·W))          [W,T floored at 1]

    Trunc (not floor) division matches DuckDB's ``//`` on negative
    grades.  One zero-shuffle streaming pass; the four regex counts are
    vectorized RE2 kernels, no Python row loop."""
    import numpy as np
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        W = pc.count_substring_regex(text, _FK_WORD_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        T = pc.count_substring_regex(text, _FK_SENT_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        V = pc.count_substring_regex(text, _FK_VOWEL_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        W0 = pc.count_substring_regex(text, _FK_NOVOWEL_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        S = V + W0
        Tc = np.maximum(T, 1)
        Wc = np.maximum(W, 1)
        num = 390_000 * Wc * Wc + 11_800_000 * S * Tc - 15_590_000 * Tc * Wc
        den = Tc * Wc
        grade = np.sign(num) * (np.abs(num) // den)  # trunc toward zero
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_words": pa.array(W),
                "n_sentences": pa.array(Tc),
                "n_syllables": pa.array(S),
                "fk_grade_micro": pa.array(grade.astype(np.int64)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


ORACLE_SQL["readability_docs"] = (
    "WITH c AS (SELECT doc_id, "
    f"CAST(length(regexp_extract_all(text, '{_FK_WORD_RE}')) AS HUGEINT) AS w, "
    f"GREATEST(CAST(length(regexp_extract_all(text, '{_FK_SENT_RE}')) AS HUGEINT), 1) AS t, "
    f"CAST(length(regexp_extract_all(text, '{_FK_VOWEL_RE}')) AS HUGEINT) "
    f"+ CAST(length(regexp_extract_all(text, '\\b[bcdfghj-np-tv-xzBCDFGHJ-NP-TV-XZ]+\\b')) AS HUGEINT) AS s "
    "FROM documents) "
    "SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(t AS BIGINT) AS n_sentences, "
    "CAST(s AS BIGINT) AS n_syllables, "
    "CAST((390000 * GREATEST(w, 1) * GREATEST(w, 1) + 11800000 * s * t "
    "- 15590000 * t * GREATEST(w, 1)) // (t * GREATEST(w, 1)) AS BIGINT) AS fk_grade_micro "
    "FROM c"
)
