"""Inverted-index sink (the W5 Elasticsearch-indexing analog): build a
hash-partitioned posting-list index distributed, look terms up reading
only one partition, and cross-check lookups against a brute-force scan."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from fscrawler_ray.pipelines.index_sink import (
    build_inverted_index,
    lookup_term,
    q_term_df,
    search,
)

SF = "/root/testdata/sf0.001"


def _brute_postings(term: str) -> np.ndarray:
    import re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        if term in re.split(r"\W+", text.lower()):
            out.append(doc_id)
    return np.array(sorted(out), dtype=np.int64)


def test_build_lookup_and_search(tmp_path):
    idx = str(tmp_path / "idx")
    n = build_inverted_index(SF, idx, n_partitions=8)
    assert n > 0
    parts = glob.glob(os.path.join(idx, "term_bucket=*"))
    assert 1 < len(parts) <= 8

    # pick two terms that actually occur
    df = q_term_df(SF, min_df=10).to_pandas().sort_values("df", ascending=False)
    assert len(df) > 2
    t1, t2 = df["token"].iloc[0], df["token"].iloc[1]

    got = lookup_term(idx, t1)
    assert got.tolist() == _brute_postings(t1).tolist()

    both = search(idx, [t1, t2], mode="and")
    either = search(idx, [t1, t2], mode="or")
    s1, s2 = set(lookup_term(idx, t1).tolist()), set(lookup_term(idx, t2).tolist())
    assert set(both.tolist()) == s1 & s2
    assert set(either.tolist()) == s1 | s2

    # unknown term: clean empty
    assert len(lookup_term(idx, "zz-no-such-token-zz")) == 0


def test_compact_index_preserves_lookups(tmp_path):
    import numpy as np

    from fscrawler_ray.pipelines.index_sink import build_inverted_index, compact_index

    idx = str(tmp_path / "idx")
    build_inverted_index(SF, idx, n_partitions=4)
    df = q_term_df(SF, min_df=10).to_pandas().sort_values("df", ascending=False)
    terms = df["token"].head(3).tolist()
    before = {t: lookup_term(idx, t).tolist() for t in terms}
    files_before = len(glob.glob(os.path.join(idx, "term_bucket=*", "*.parquet")))
    n = compact_index(idx)
    assert n >= 1
    files_after = len(glob.glob(os.path.join(idx, "term_bucket=*", "*.parquet")))
    assert files_after < files_before
    assert files_after <= 4
    for t in terms:
        assert lookup_term(idx, t).tolist() == before[t]
    # idempotent
    compact_index(idx)
    for t in terms:
        assert lookup_term(idx, t).tolist() == before[t]


def test_phrase_search_planted(tmp_path):
    """Positional postings: adjacency must hold exactly — 'b c' matches,
    'c b' does not; repeated tokens, phrase at start/end, punctuation gaps
    and cross-doc splits all behave."""
    import pyarrow as pa

    from fscrawler_ray.pipelines.index_sink import compact_index, phrase_search

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma",        # phrase at start + middle
                    "gamma beta alpha",        # reversed — must NOT match 'beta gamma'
                    "x Beta, GAMMA! y",        # case + punctuation separators
                    "beta beta gamma",         # repeated first token
                    "beta",                    # term alone — no adjacency
                ]
            ),
        }
    )
    src = tmp_path / "sf"
    src.mkdir()
    pq.write_table(docs, str(src / "documents.parquet"))
    idx = str(tmp_path / "idx")
    build_inverted_index(str(src), idx, n_partitions=4)

    assert phrase_search(idx, "beta gamma").tolist() == [0, 2, 3]
    assert phrase_search(idx, "gamma beta").tolist() == [1]
    assert phrase_search(idx, "alpha beta gamma").tolist() == [0]
    assert phrase_search(idx, "beta beta").tolist() == [3]
    assert phrase_search(idx, "beta delta").tolist() == []
    assert phrase_search(idx, "").tolist() == []
    # compaction preserves positional lookups
    compact_index(idx)
    assert phrase_search(idx, "beta gamma").tolist() == [0, 2, 3]


def test_phrase_hits_matches_regex_oracle():
    """q_phrase_hits ≡ the DuckDB adjacency-regex oracle at sf0.001 (the
    same check the driver runs, inlined for the suite)."""
    import duckdb

    from fscrawler_ray.pipelines.index_sink import ORACLE_SQL, q_phrase_hits

    got = q_phrase_hits(SF).column("doc_id").to_pylist()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = [r[0] for r in con.execute(ORACLE_SQL["phrase_hits"]).fetchall()]
    assert got == want and len(got) > 0


def test_tfidf_topk_planted(tmp_path, monkeypatch):
    """Integer-scaled tf·idf ranking on a corpus with known counts:
    rarer terms must outweigh common ones, tf multiplies, ties break by
    doc_id ascending at the k-boundary."""
    import pyarrow as pa

    from fscrawler_ray.pipelines import index_sink

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "merge merge merge",   # tf=3 of the rare term
                    "hash join",           # one of each common term
                    "hash hash hash hash", # high tf of a common term
                    "nothing relevant",
                ]
            ),
        }
    )
    src = tmp_path / "sf"
    src.mkdir()
    pq.write_table(docs, str(src / "documents.parquet"))
    out = index_sink.q_tfidf_topk(str(src), terms=("hash", "join", "merge"), k=3).to_pandas()
    # N=4: df(merge)=1 → idf 4000; df(hash)=2 → 2000; df(join)=1 → 4000
    # doc0 = 3*4000 = 12000; doc1 = 2000+4000 = 6000; doc2 = 4*2000 = 8000
    assert out["doc_id"].tolist() == [0, 2, 1]
    assert out["score"].tolist() == [12000, 8000, 6000]


def test_doc_keywords_prefers_rare_terms(ray_session, tmp_path):
    """A doc mixing a corpus-wide stopword with a unique term must rank
    the unique term first; rnk is 1..k with no dupes per doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.index_sink import q_doc_keywords

    rows = [(i, "common filler words here " + (f"unique{i} " * 2)) for i in range(20)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = q_doc_keywords(str(tmp_path)).to_pandas()
    top1 = out[out["rnk"] == 1].set_index("doc_id")["token"]
    for i in range(20):
        assert top1[i] == f"unique{i}", top1[i]
    # per doc: ranks are 1..3, distinct tokens
    for _, g in out.groupby("doc_id"):
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1))
        assert g["token"].is_unique


def test_update_index_equals_full_rebuild(tmp_path, ray_session):
    """Incremental delete+reinsert produces postings identical (token,
    doc_id, pos — position-for-position) to indexing the edited corpus
    from scratch."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from fscrawler_ray.pipelines.index_sink import compact_index, index_docs, update_index

    def corpus(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    base = [
        (1, "alpha beta gamma"),
        (2, "beta beta delta"),
        (3, "gamma delta epsilon"),
        (4, "alpha epsilon"),
        (5, "zeta eta theta"),
    ]
    changed = [(2, "omega beta"), (4, "omega omega alpha")]
    deleted = [5]
    edited = [r for r in base if r[0] not in {2, 4, 5}] + changed

    inc_dir = str(tmp_path / "inc")
    index_docs(corpus(base), inc_dir, n_partitions=4)
    update_index(inc_dir, corpus(changed), deleted)
    compact_index(inc_dir)

    full_dir = str(tmp_path / "full")
    index_docs(corpus(edited), full_dir, n_partitions=4)
    compact_index(full_dir)

    def postings(d):
        files = sorted(glob.glob(os.path.join(d, "term_bucket=*", "*.parquet")))
        t = pa.concat_tables([pq.read_table(f, columns=["token", "doc_id", "pos"]) for f in files])
        return sorted(zip(*[t.column(c).to_pylist() for c in ["token", "doc_id", "pos"]]))

    assert postings(inc_dir) == postings(full_dir)
