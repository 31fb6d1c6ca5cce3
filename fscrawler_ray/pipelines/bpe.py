"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-training step of an LLM data pipeline, Ray-Data-native.

Reference analog: the keyword/token extractors process text row by row
(app/processors/metadata_extractor/text_line_keywords_processor.py); this
LEARNS the subword inventory from corpus statistics instead.

Shape (the standard distributed BPE trainer, e.g. Spark implementations):

1. ONE streaming corpus-sized pass collapses documents to a distinct-word
   frequency table (per-block partial counts, then a word-keyed groupby) —
   at 100 TB this is the only stage that sees the corpus, and its shuffle
   key volume is vocabulary-bounded (Heaps' law: ~10^7-10^8 distinct words,
   not 10^10 documents).
2. K merge rounds run over the word table only: count adjacent symbol
   pairs (weighted by word frequency, per-block partials again), pick the
   global argmax (count desc, then lexicographic for determinism), apply
   the merge everywhere.  A real 32k-merge tokenizer run is the same loop;
   the per-round cost is bounded by the word table, never the corpus.

Symbolization trick that keeps BOTH sides vectorized AND bit-identical:
a word's current symbol sequence is stored as a bracketed string —
"hello" → "(h)(e)(l)(l)(o)(</w>)" — so applying merge (a, b) is ONE plain
substring replace of "(a)(b)" with "(ab)".  Arrow's replace_substring and
DuckDB's replace() share left-to-right non-overlapping semantics, which is
exactly BPE's merge order ("(l)(l)(l)" → "(ll)(l)"), and per-symbol
brackets mean consecutive occurrences never share a delimiter character
(the classic space-separated encoding fails there).  Words are restricted
to [a-z]+ (post-lowering), so the bracket characters cannot occur inside a
symbol.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

BPE_MERGES = 10  # unrolled in the SQL oracle; a real run sets 32_000
EOW = "</w>"


def _word_counts(sf_dir: str):
    """Corpus pass: documents.text → distinct (word, freq), words = [a-z]+
    runs of the lowered text (the SQL twin is regexp_extract_all)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern_regex(pc.ascii_lower(b.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        if not len(flat):
            return pa.table(
                {"word": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        codes, uniq = pd.factorize(flat.to_pandas(), sort=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"word": pa.array(uniq, pa.string()), "freq": pa.array(n)})

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq"))
    )
    return out.map_batches(
        lambda b: b.rename_columns(["word", "freq"]), batch_format="pyarrow"
    )


def _symbolize(b: pa.Table) -> pa.Table:
    """word → '(w)(o)(r)(d)(</w>)' initial symbolization."""
    words = b.column("word").to_numpy(zero_copy_only=False)
    s = np.array(
        ["".join(f"({c})" for c in w) + f"({EOW})" for w in words], dtype=object
    )
    return pa.table({"s": pa.array(s, pa.string()), "freq": b.column("freq")})


def _pair_count_block(b: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts weighted by word freq for ONE block —
    the shared kernel of the distributed per-block partial AND the
    driver-side small-vocab fast path (one block = global counts)."""
    import pandas as pd

    empty = pa.table(
        {
            "lhs": pa.array([], pa.string()),
            "rhs": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    if not b.num_rows:
        return empty
    syms = pc.split_pattern(pc.utf8_trim(b.column("s"), "()"), ")(")
    lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(syms).to_pandas().to_numpy()
    freq = b.column("freq").to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    if not total:
        return empty
    # adjacent positions within the same word only
    off = np.concatenate([[0], np.cumsum(lens)])
    is_last = np.zeros(total, bool)
    is_last[off[1:] - 1] = True
    li = np.arange(total)[~is_last]
    if not len(li):
        return empty
    w_of = np.repeat(np.arange(len(lens)), lens)[li]
    pair = np.char.add(
        np.char.add(flat[li].astype(str), "\t"), flat[li + 1].astype(str)
    )
    codes, uniq = pd.factorize(pair, sort=False)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(cnt, codes, freq[w_of])
    l_r = np.char.partition(uniq.astype(str), "\t")
    return pa.table(
        {
            "lhs": pa.array(l_r[:, 0], pa.string()),
            "rhs": pa.array(l_r[:, 2], pa.string()),
            "cnt": pa.array(cnt),
        }
    )


def _pair_counts(words_ds):
    """Adjacent-symbol pair counts weighted by word freq; per-block partial
    then a pair-keyed groupby (pair key volume ≤ running vocab²-bounded,
    in practice ~alphabet-sized early and merge-table-sized late)."""
    out = (
        words_ds.map_batches(_pair_count_block, batch_format="pyarrow")
        .groupby(["lhs", "rhs"])
        .aggregate(Sum("cnt"))
    )
    return out.map_batches(
        lambda b: b.rename_columns(["lhs", "rhs", "cnt"]), batch_format="pyarrow"
    )


def train_bpe(sf_dir: str, k: int = BPE_MERGES, driver_vocab_limit: int = 100_000):
    """Learn the first ``k`` BPE merges over documents.text.

    Returns (merges_table, final_words_ds): merges_table is a k-row arrow
    table (step, lhs, rhs, cnt) — the tokenizer artifact — and
    final_words_ds the word table under the learned segmentation.

    Adaptive rounds: the corpus pass is ALWAYS distributed (the only
    stage that sees the corpus); the K merge rounds run over the
    vocabulary-bounded word table, which below ``driver_vocab_limit``
    rows is output-sized state — those rounds run driver-side on the
    collected table with the SAME kernel (`_pair_count_block` on one
    block IS the global pair count), saving 2·K Ray executions of pure
    scheduling overhead.  Above the limit (a 100 TB corpus's 10^7-10^8
    distinct words) the rounds run as distributed partial-argmax passes;
    both paths are merge-for-merge identical (pytest parity)."""
    words = _word_counts(sf_dir).map_batches(_symbolize, batch_format="pyarrow")
    words = words.materialize()  # vocab-bounded; re-read every round
    if words.count() <= driver_vocab_limit:
        t = pa.concat_tables(
            [b for b in words.iter_batches(batch_format="pyarrow")] or
            [pa.table({"s": pa.array([], pa.string()), "freq": pa.array([], pa.int64())})]
        )
        steps = []
        for step in range(1, k + 1):
            cnts = _pair_count_block(t)
            if not cnts.num_rows:
                break
            df = cnts.to_pandas().sort_values(
                ["cnt", "lhs", "rhs"], ascending=[False, True, True]
            ).head(1)
            lhs, rhs, cnt = df["lhs"].iloc[0], df["rhs"].iloc[0], int(df["cnt"].iloc[0])
            steps.append({"step": step, "lhs": lhs, "rhs": rhs, "cnt": cnt})
            t = pa.table(
                {
                    "s": pc.replace_substring(t.column("s"), f"({lhs})({rhs})", f"({lhs}{rhs})"),
                    "freq": t.column("freq"),
                }
            )
        merges = pa.table(
            {
                "step": pa.array([r["step"] for r in steps], pa.int64()),
                "lhs": pa.array([r["lhs"] for r in steps], pa.string()),
                "rhs": pa.array([r["rhs"] for r in steps], pa.string()),
                "cnt": pa.array([r["cnt"] for r in steps], pa.int64()),
            }
        )
        return merges, ray.data.from_arrow(t)

    def block_best(b: pa.Table) -> pa.Table:
        """Per-block argmax partial (cnt desc, then lexicographic): the
        global top-1 needs no sort shuffle — each aggregate block emits one
        candidate and the driver folds the block-count-sized remainder."""
        if not b.num_rows:
            return b
        import pandas as pd

        df = b.to_pandas().sort_values(
            ["cnt", "lhs", "rhs"], ascending=[False, True, True]
        )
        return pa.Table.from_pandas(df.head(1), preserve_index=False)

    steps = []
    for step in range(1, k + 1):
        cands = _pair_counts(words).map_batches(
            block_best, batch_format="pyarrow"
        ).take_all()
        if not cands:
            break
        top = sorted(cands, key=lambda r: (-r["cnt"], r["lhs"], r["rhs"]))[:1]
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        steps.append({"step": step, "lhs": lhs, "rhs": rhs, "cnt": cnt})
        pat, rep = f"({lhs})({rhs})", f"({lhs}{rhs})"

        def apply(b: pa.Table, pat=pat, rep=rep) -> pa.Table:
            return pa.table(
                {
                    "s": pc.replace_substring(b.column("s"), pat, rep),
                    "freq": b.column("freq"),
                }
            )

        words = words.map_batches(apply, batch_format="pyarrow").materialize()

    merges = pa.table(
        {
            "step": pa.array([r["step"] for r in steps], pa.int64()),
            "lhs": pa.array([r["lhs"] for r in steps], pa.string()),
            "rhs": pa.array([r["rhs"] for r in steps], pa.string()),
            "cnt": pa.array([r["cnt"] for r in steps], pa.int64()),
        }
    )
    return merges, words


_TRAIN_CACHE: dict[tuple, tuple] = {}


def _trained(sf_dir: str, k: int = BPE_MERGES):
    """Per-process memo of (merges, final words ds): the trainer is
    deterministic, so the three queries() surfaces (merges / vocab /
    encode) share one run per (sf_dir, k) inside a sweep or bench."""
    key = (sf_dir, k)
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = train_bpe(sf_dir, k=k)
    return _TRAIN_CACHE[key]


def q_bpe_merges(sf_dir: str):
    """queries() surface: the learned merge table (the tokenizer)."""
    return _trained(sf_dir)[0]


def q_bpe_vocab(sf_dir: str):
    """queries() surface: symbol inventory after BPE_MERGES merges —
    per-symbol corpus counts (freq-weighted), the subword vocabulary."""
    _, words = _trained(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        if not b.num_rows:
            return pa.table(
                {"sym": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        syms = pc.split_pattern(pc.utf8_trim(b.column("s"), "()"), ")(")
        lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(syms).to_pandas().to_numpy()
        freq = b.column("freq").to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(flat, sort=False)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(cnt, codes, np.repeat(freq, lens))
        return pa.table({"sym": pa.array(uniq, pa.string()), "cnt": pa.array(cnt)})

    out = (
        words.map_batches(partial, batch_format="pyarrow")
        .groupby("sym")
        .aggregate(Sum("cnt"))
    )
    return out.map_batches(
        lambda b: b.rename_columns(["sym", "cnt"]), batch_format="pyarrow"
    )


def q_bpe_merges_distributed(sf_dir: str, k: int = 3):
    """queries() surface for the DISTRIBUTED merge-round path (the
    >driver_vocab_limit branch of :func:`train_bpe`, forced with limit 0):
    each round counts pairs with per-block partials + a pair-keyed groupby
    and picks the argmax via per-block candidates — the 100 TB path,
    exercised at bench scale (VERDICT r04 #5).  Merge-for-merge identical
    to the driver-side path (pytest parity) and replayed by the same
    unrolled-CTE oracle at k=3."""
    return train_bpe(sf_dir, k=k, driver_vocab_limit=0)[0]


def _iter_sql(k: int) -> str:
    """Unrolled-CTE DuckDB replay of the k merge rounds (the PageRank-style
    fixed-iteration oracle device)."""
    parts = [
        "WITH w0 AS MATERIALIZED (SELECT '(' || array_to_string(string_split(word, ''), ')(') "
        f"|| ')({EOW})' AS s, freq FROM ("
        "SELECT word, CAST(count(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word "
        "FROM documents) GROUP BY word))"
    ]
    for i in range(1, k + 1):
        p = (
            f"p{i} AS MATERIALIZED (SELECT syms[i] AS lhs, syms[i+1] AS rhs, "
            "CAST(SUM(freq) AS BIGINT) AS cnt FROM ("
            f"SELECT string_split(trim(s, '()'), ')(') AS syms, freq FROM w{i-1}), "
            "unnest(range(1, len(syms))) t(i) GROUP BY lhs, rhs)"
        )
        m = f"m{i} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
        w = (
            f"w{i} AS MATERIALIZED (SELECT replace(s, '(' || m.lhs || ')(' || m.rhs || ')', "
            f"'(' || m.lhs || m.rhs || ')') AS s, freq FROM w{i-1}, m{i} m)"
        )
        parts += [p, m, w]
    return ", ".join(parts)


def bpe_merges_sql(k: int = BPE_MERGES) -> str:
    body = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, cnt FROM m{i}"
        for i in range(1, k + 1)
    )
    return _iter_sql(k) + " SELECT * FROM (" + body + ")"


def bpe_vocab_sql(k: int = BPE_MERGES) -> str:
    return (
        _iter_sql(k)
        + " SELECT sym, CAST(SUM(freq) AS BIGINT) AS cnt FROM ("
        f"SELECT unnest(string_split(trim(s, '()'), ')(')) AS sym, freq FROM w{k}"
        ") GROUP BY sym"
    )


ORACLE_SQL = {
    "bpe_merges": bpe_merges_sql(),
    "bpe_vocab": bpe_vocab_sql(),
    "bpe_merges_distributed": bpe_merges_sql(k=3),
}


def q_bpe_encode_docs(sf_dir: str, k: int = BPE_MERGES):
    """Apply the learned tokenizer to the corpus: per-document subword
    count under the first ``k`` BPE merges, plus the character count the
    subwords cover — the fertility / compression diagnostic every
    tokenizer-training run reports (subwords-per-word, chars-per-subword).

    Scale posture: training touches the corpus once (word-count pass);
    encoding is ONE more zero-shuffle streaming pass — the k learned
    merges are a broadcast-sized list applied as k chained vectorized
    substring replaces per batch.  Nothing corpus-sized shuffles.

    Output: (doc_id, n_words, n_chars, n_subwords).
    """
    merges, _ = _trained(sf_dir, k)
    pats = [
        (f"({r['lhs']})({r['rhs']})", f"({r['lhs']}{r['rhs']})")
        for r in merges.to_pylist()
    ]

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def encode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.ascii_lower(b.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        keep = pc.greater(pc.utf8_length(flat), 0)
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(zero_copy_only=False)
        # per-word bracket symbolization, vectorized: each kept word w →
        # '(' + join(chars, ')(') + ')(</w>)'
        kept = flat.filter(keep)
        n_chars_w = pc.utf8_length(kept).cast(pa.int64())
        words_np = kept.to_numpy(zero_copy_only=False)
        s = np.array(
            ["(" + ")(".join(w) + f")({EOW})" for w in words_np], dtype=object
        )
        sa = pa.array(s, pa.string())
        for pat, rep in pats:
            sa = pc.replace_substring(sa, pat, rep)
        # subwords per word = bracketed segment count, excluding a
        # STANDALONE '(</w>)' marker segment (a merged marker like
        # '(t</w>)' is a real subword and counts)
        n_sub_w = (
            pc.count_substring(sa, "(").cast(pa.int64()).to_numpy(zero_copy_only=False)
            - pc.count_substring(sa, f"({EOW})")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # roll word stats back up to docs
        keep_np = keep.to_numpy(zero_copy_only=False)
        w_doc = np.repeat(np.arange(len(lens)), lens)[keep_np]
        n_docs = b.num_rows
        n_words = np.bincount(w_doc, minlength=n_docs).astype(np.int64)
        n_chars = np.zeros(n_docs, np.int64)
        np.add.at(n_chars, w_doc, n_chars_w.to_numpy(zero_copy_only=False))
        n_sub = np.zeros(n_docs, np.int64)
        np.add.at(n_sub, w_doc, n_sub_w)
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_words": pa.array(n_words),
                "n_chars": pa.array(n_chars),
                "n_subwords": pa.array(n_sub),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow")


def bpe_encode_sql(k: int = BPE_MERGES) -> str:
    """Replay: explode doc words, apply the SAME k replaces (the merge CTEs
    come from _iter_sql's m1..mK), count '(' segments per word, roll up."""
    reps = "s"
    for i in range(1, k + 1):
        reps = (
            f"replace({reps}, '(' || (SELECT lhs FROM m{i}) || ')(' || "
            f"(SELECT rhs FROM m{i}) || ')', '(' || (SELECT lhs FROM m{i}) || "
            f"(SELECT rhs FROM m{i}) || ')')"
        )
    return (
        _iter_sql(k) + ", "
        "dw AS MATERIALIZED (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word "
        "FROM documents), "
        "enc AS MATERIALIZED (SELECT doc_id, length(word) AS wchars, "
        "'(' || array_to_string(string_split(word, ''), ')(') || ')(" + EOW + ")' AS s "
        "FROM dw), "
        f"done AS MATERIALIZED (SELECT doc_id, wchars, {reps} AS s2 FROM enc) "
        "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
        "CAST(COALESCE(e.n_words, 0) AS BIGINT) AS n_words, "
        "CAST(COALESCE(e.n_chars, 0) AS BIGINT) AS n_chars, "
        "CAST(COALESCE(e.n_subwords, 0) AS BIGINT) AS n_subwords "
        "FROM documents d LEFT JOIN ("
        "SELECT doc_id, count(*) AS n_words, SUM(wchars) AS n_chars, "
        "SUM(length(s2) - length(replace(s2, '(', '')) "
        f"- (length(s2) - length(replace(s2, '({EOW})', ''))) // {len(EOW) + 2}"
        ") AS n_subwords "
        "FROM done GROUP BY doc_id) e USING (doc_id)"
    )


ORACLE_SQL["bpe_encode_docs"] = bpe_encode_sql()


def q_bpe_fertility_by_lang(sf_dir: str, k: int = BPE_MERGES):
    """Tokenizer-equity diagnostic (fertility per language): fold the
    per-document encode stats by documents.lang — fertility_micro =
    subwords-per-word × 10^6 as exact integer division, the number a
    multilingual tokenizer run inspects to see which languages the merge
    inventory under-serves.  Same posture as q_bpe_encode_docs plus one
    lang-bounded groupby; the doc→lang decoration rides the encode pass
    (doc_id order is block order, so lang comes from the SAME read —
    no join)."""
    merges, _ = _trained(sf_dir, k)
    pats = [
        (f"({r['lhs']})({r['rhs']})", f"({r['lhs']}{r['rhs']})")
        for r in merges.to_pylist()
    ]
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern_regex(pc.ascii_lower(b.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        keep = pc.greater(pc.utf8_length(flat), 0)
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(zero_copy_only=False)
        kept = flat.filter(keep)
        words_np = kept.to_numpy(zero_copy_only=False)
        s = np.array(
            ["(" + ")(".join(w) + f")({EOW})" for w in words_np], dtype=object
        )
        sa = pa.array(s, pa.string())
        for pat, rep in pats:
            sa = pc.replace_substring(sa, pat, rep)
        n_sub_w = (
            pc.count_substring(sa, "(").cast(pa.int64()).to_numpy(zero_copy_only=False)
            - pc.count_substring(sa, f"({EOW})")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep_np = keep.to_numpy(zero_copy_only=False)
        w_doc = np.repeat(np.arange(len(lens)), lens)[keep_np]
        codes, langs = pd.factorize(b.column("lang").to_pandas(), sort=False)
        n_words = np.bincount(codes[w_doc], minlength=len(langs)).astype(np.int64)
        n_sub = np.zeros(len(langs), np.int64)
        np.add.at(n_sub, codes[w_doc], n_sub_w)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_words": pa.array(n_words),
                "n_subwords": pa.array(n_sub),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_words"), Sum("n_subwords"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["lang", "n_words", "n_subwords"])
        # a lang with zero extractable words has no word rows in the SQL
        # twin (GROUP BY over the word table) — drop it here too
        b = b.filter(pc.greater(b.column("n_words"), 0))
        w = b.column("n_words").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("n_subwords").to_numpy(zero_copy_only=False).astype(np.int64)
        fert = s * 1_000_000 // np.maximum(w, 1)
        return b.append_column("fertility_micro", pa.array(fert, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def bpe_fertility_sql(k: int = BPE_MERGES) -> str:
    reps = "s"
    for i in range(1, k + 1):
        reps = (
            f"replace({reps}, '(' || (SELECT lhs FROM m{i}) || ')(' || "
            f"(SELECT rhs FROM m{i}) || ')', '(' || (SELECT lhs FROM m{i}) || "
            f"(SELECT rhs FROM m{i}) || ')')"
        )
    return (
        _iter_sql(k) + ", "
        "dw2 AS MATERIALIZED (SELECT lang, "
        "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents), "
        "enc2 AS MATERIALIZED (SELECT lang, "
        "'(' || array_to_string(string_split(word, ''), ')(') || ')(" + EOW + ")' AS s "
        "FROM dw2), "
        f"done2 AS MATERIALIZED (SELECT lang, {reps} AS s2 FROM enc2) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(SUM(length(s2) - length(replace(s2, '(', '')) "
        f"- (length(s2) - length(replace(s2, '({EOW})', ''))) // {len(EOW) + 2}"
        ") AS BIGINT) AS n_subwords, "
        "CAST(SUM(length(s2) - length(replace(s2, '(', '')) "
        f"- (length(s2) - length(replace(s2, '({EOW})', ''))) // {len(EOW) + 2}"
        ") * 1000000 // count(*) AS BIGINT) AS fertility_micro "
        "FROM done2 GROUP BY lang"
    )


ORACLE_SQL["bpe_fertility_by_lang"] = bpe_fertility_sql()
