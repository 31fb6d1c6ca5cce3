

def test_postings_varint_bucket_invariance(tmp_path, ray_session):
    """The two-level (term, rng) gap scan is an implementation detail:
    any range_width yields the identical per-term byte cost, equal to a
    single-list reference computation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.index_sink import q_postings_varint

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta"]
    rows = [" ".join(rng.choice(words, size=rng.integers(3, 9))) for _ in range(300)]
    d = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(0, 60000, 200), pa.int64())[:300],
                  "text": pa.array(rows)}),
        f"{d}/documents.parquet",
    )

    def vb(g):
        return 1 if g < 128 else 2 if g < 16384 else 3 if g < 2097152 else 4 if g < 268435456 else 5

    # reference: single sorted list per term
    want = {}
    for did, text in zip(range(0, 60000, 200), rows):
        for w in set(text.split()):
            want.setdefault(w, []).append(did)
    ref = {
        t: (len(ds), vb(ds[0]) + sum(vb(b - a) for a, b in zip(ds, ds[1:])))
        for t, ds in ((t, sorted(ds)) for t, ds in want.items())
    }

    for width in (64, 512, 10**9):
        out = q_postings_varint(d, range_width=width).to_pandas().set_index("term")
        assert len(out) == len(ref)
        for t, (df, vbytes) in ref.items():
            assert int(out.loc[t, "df"]) == df
            assert int(out.loc[t, "varint_bytes"]) == vbytes, (t, width)
            assert int(out.loc[t, "raw_bytes"]) == df * 8
