"""DSIR importance resampling: weights must be partition-invariant
(pure function of the corpus, not its blocking), the target slice must
score higher than the rest on average (the whole point of the method),
the xxh64 scale path must agree with the md5 oracle path on ranking
shape, and degenerate docs must weigh 0."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from fscrawler_ray.pipelines.dsir import (
    DSIR_B,
    dsir_lambda,
    dsir_weights_ds,
    gram_buckets,
    q_dsir_select,
)

SF = "/root/testdata/sf0.001"


def _weights(md5=True) -> pd.DataFrame:
    return (
        dsir_weights_ds(SF, md5=md5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_weights_partition_invariant():
    a = _weights()
    ds = ray.data.read_parquet(f"{SF}/documents.parquet").repartition(7)
    # same two passes over a differently-blocked input
    import fscrawler_ray.pipelines.dsir as mod

    ct, cr = mod._bucket_counts(ds, DSIR_B, "lang", "en", True)
    lam = dsir_lambda(ct, cr, DSIR_B)

    def score(b: pa.Table) -> pa.Table:
        bkt, doc, n = gram_buckets(b.column("text"), DSIR_B)
        w = np.zeros(n, np.int64)
        if len(bkt):
            order = np.argsort(doc, kind="stable")
            d, v = doc[order], lam[bkt[order]]
            starts = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
            w[d[starts]] = np.add.reduceat(v, starts)
        return pa.table({"doc_id": b.column("doc_id"), "weight_unats": pa.array(w, pa.int64())})

    b = (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_target_slice_scores_higher():
    w = _weights()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    m = w.merge(docs, on="doc_id")
    en = m.loc[m["lang"] == "en", "weight_unats"].mean()
    rest = m.loc[m["lang"] != "en", "weight_unats"].mean()
    assert en > rest, (en, rest)
    # and the top-k selection is dominated by target-like docs
    sel = q_dsir_select(SF, k=50).to_pandas().merge(docs, on="doc_id")
    assert (sel["lang"] == "en").mean() > 0.8, sel["lang"].value_counts()


def test_xxh_scale_path_agrees_on_ranking_shape():
    """The xxh64 fold is the 100 TB path; different hash → different
    bucket collisions, but the target-vs-rest separation must hold and
    per-doc weights must correlate strongly with the md5 path."""
    a, b = _weights(md5=True), _weights(md5=False)
    assert len(a) == len(b)
    r = np.corrcoef(a["weight_unats"], b["weight_unats"])[0, 1]
    assert r > 0.8, r
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    m = b.merge(docs, on="doc_id")
    assert (
        m.loc[m["lang"] == "en", "weight_unats"].mean()
        > m.loc[m["lang"] != "en", "weight_unats"].mean()
    )


def test_degenerate_docs_weigh_zero():
    bkt, doc, n = gram_buckets(pa.array(["", "   ", "one"]), DSIR_B)
    assert n == 3
    # the whitespace-only docs contribute no grams
    assert set(doc.tolist()) == {2}
    # single-token doc: exactly one unigram, no bigram
    assert len(bkt) == 1


def test_lambda_quantization_matches_duckdb_round():
    """round-half-away-from-zero parity with DuckDB's round() on the
    actual λ expression for a grid of integer counts."""
    import duckdb

    ct = np.array([0, 1, 5, 100, 7], np.int64)
    cr = np.array([3, 1, 9, 100, 7000], np.int64)
    B = 5
    lam = dsir_lambda(ct, cr, B)
    tt, tr = int(ct.sum()), int(cr.sum())
    con = duckdb.connect()
    got = con.sql(
        "SELECT CAST(round(1000000 * (((ln(nt + 1) - ln($tt + $b)) - ln(nr + 1)) + ln($tr + $b))) AS BIGINT) "
        "FROM (SELECT unnest($ct::BIGINT[]) AS nt, unnest($cr::BIGINT[]) AS nr)",
        params={"tt": tt, "tr": tr, "b": B, "ct": ct.tolist(), "cr": cr.tolist()},
    ).fetchnumpy()
    assert (list(got.values())[0] == lam).all()
