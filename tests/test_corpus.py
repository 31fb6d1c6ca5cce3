"""Corpus hygiene: near-dup REMOVAL (pairs → components → filtered
corpus) and the composed C4-style cleaning pass."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.pipelines.corpus import clean_text_corpus, dedup_corpus, neardup_components

SF = "/root/testdata/sf0.001"


def test_neardup_components_unionfind():
    a = np.array([1, 2, 10, 20], dtype=np.int64)
    b = np.array([2, 3, 11, 10], dtype=np.int64)
    out = neardup_components(a, b)
    # {1,2,3} keep 1; {10,11,20} keep 10
    assert out["components"] == 2
    assert out["drop"].tolist() == [2, 3, 11, 20]


def test_dedup_corpus_removes_planted_neardups(tmp_path):
    base = ("the quick brown fox jumps over the lazy dog while the cat watches "
            "from the warm windowsill and the rain falls gently on the quiet street")
    texts = [base, base.replace("rain", "snow"), base.replace("quick", "slow")]
    texts += [f"unrelated doc {i} " + " ".join(f"w{i}{j}" for j in range(30)) for i in range(25)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    d = tmp_path / "mini"; d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    kept = dedup_corpus(str(d), jaccard_threshold=0.5).to_pandas()
    ids = set(kept["doc_id"])
    assert 0 in ids                      # keeper = min doc id of the cluster
    assert not {1, 2} & ids              # near-dups dropped
    assert len(ids) == len(texts) - 2    # everything else survives


def test_clean_text_corpus_tally_consistent():
    kept, tally = clean_text_corpus(SF)
    df = kept.to_pandas()
    assert tally["total"] == 500
    assert tally["kept"] == len(df)
    assert tally["kept"] + tally["rej_lang"] >= tally["total"] - (
        tally["rej_quality"] + tally["rej_short"] + tally["rej_exact"] + tally["rej_neardup"]
    )
    # kept rows satisfy every rule
    assert df["quality_score"].min() >= 0.25
    assert df["n_chars"].min() >= 40
    assert set(df["pred_lang"]).issubset({"en", "fr", "de", "es"})
    # deterministic
    _, tally2 = clean_text_corpus(SF)
    assert tally == tally2
