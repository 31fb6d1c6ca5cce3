"""images_neardup_groups transitivity + BM25 scoring semantics."""

import numpy as np
import pyarrow as pa

import ray

from fscrawler_ray.pipelines.dedup import images_neardup_groups
from fscrawler_ray.pipelines.index_sink import q_bm25_scores

SF = "/root/testdata/sf0.001"


def _fake_images(ids, phashes):
    return ray.data.from_arrow(
        pa.table({"image_id": pa.array(ids, pa.string()), "phash": pa.array(phashes, pa.int64())})
    )


def test_transitive_chain_groups_beyond_pairwise_cutoff():
    # a~b: 4 bits flipped inside band 1; b~c: 4 more inside band 2;
    # a~c: hamming 8 > 6 — only connectivity puts all three together
    p_a = 0
    p_b = p_a ^ (0xF << 16)
    p_c = p_b ^ (0xF << 32)
    assert bin(p_a ^ p_c).count("1") == 8
    ds = _fake_images(["a", "b", "c", "lone"], [p_a, p_b, p_c, 0x5A5A5A5A5A5A5A5A])
    got = images_neardup_groups(ds, max_hamming=6).to_pandas().sort_values("image_id")
    assert list(got["image_id"]) == ["a", "b", "c"]  # 'lone' absent: no pair
    assert set(got["canonical_id"]) == {"a"}  # lexicographic-min keeper


def test_groups_empty_when_no_pairs():
    ds = _fake_images(["x", "y"], [0, -1])  # hamming 64
    got = images_neardup_groups(ds, max_hamming=6)
    assert got.num_rows == 0
    assert got.column_names == ["image_id", "canonical_id"]


def test_bm25_scores_match_plain_python():
    import duckdb
    import math
    import re
    from collections import Counter

    docs = duckdb.sql(f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')").df()
    terms = ("hash", "join", "merge")
    toks = {r.doc_id: [t for t in re.split(r"\W+", r.text.lower()) if t] for r in docs.itertuples()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {d: Counter(t for t in v if t in terms) for d, v in toks.items()}
    df = Counter(t for c in tf.values() for t in c)
    want = {}
    for d, c in tf.items():
        if not c:
            continue
        s = 0.0
        for t, f in c.items():
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * (len(toks[d]) / avgdl)))
        want[d] = s
    got = q_bm25_scores(SF).to_pandas()
    assert set(got["doc_id"]) == set(want)
    for d, s in zip(got["doc_id"], got["score"]):
        assert abs(s - want[d]) <= 1e-9 * max(1.0, abs(want[d]))


def test_bm25_longer_doc_scores_below_shorter_at_equal_tf(tmp_path):
    import pyarrow.parquet as pq

    filler = " ".join(["zzz"] * 200)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["hash table", "hash " + filler], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([10, 10], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = q_bm25_scores(str(tmp_path)).to_pandas().set_index("doc_id")["score"]
    assert got[1] > got[2]  # length normalization penalizes the padded doc


def test_bm25_topk_quantized_rank(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.index_sink import q_bm25_topk

    # doc 1 mentions 'hash' 3x (short), doc 2 once (long), doc 3 never;
    # docs 4+5 are identical → equal scores, tie broken by doc_id
    texts = [
        "hash hash hash",
        "hash " + "filler " * 40,
        "nothing relevant here",
        "join merge",
        "join merge",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()), "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    t = q_bm25_topk(str(tmp_path), k=3).to_pandas()
    assert 3 not in set(t["doc_id"])  # non-matching doc absent
    # ties quantize equal and resolve by doc_id: 4 before 5
    if {4, 5} <= set(t["doc_id"]):
        s = t.set_index("doc_id")["score_micro"]
        assert s[4] == s[5]
        assert list(t["doc_id"]).index(4) < list(t["doc_id"]).index(5)
    assert (np.diff(t["score_micro"].to_numpy()) <= 0).all()  # descending


def test_hybrid_search_shortlist_and_determinism(ray_session):
    from fscrawler_ray.pipelines.index_sink import q_bm25_topk, q_hybrid_search

    sf = "/root/testdata/sf0.001"
    a = q_hybrid_search(sf).to_pandas()
    b = q_hybrid_search(sf).to_pandas()
    assert a.equals(b)
    assert list(a["rnk"]) == list(range(1, len(a) + 1))
    # the hybrid result is a re-ranking OF the lexical shortlist
    short = set(q_bm25_topk(sf, k=40).to_pandas()["doc_id"])
    assert set(a["doc_id"]) <= short
