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


ORACLE_SQL = {
    "quality_counts": (
        "SELECT doc_id, length(text) AS n_chars, "
        "cast(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
        "cast(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct, "
        f"cast(len(regexp_extract_all(lower(text), '{_STOPWORDS_PAT}')) AS BIGINT) AS n_stop "
        "FROM documents"
    ),
    "langid_docs": _langid_sql(),
}


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
