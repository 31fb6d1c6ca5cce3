"""Decontamination + repetition stats — planted overlaps vs brute force."""

import numpy as np
import pyarrow as pa

import ray

from fscrawler_ray.pipelines.decontam import (
    _token_hashes,
    _window_hashes,
    benchmark_gram_hashes,
    decontaminate,
    repetition_stats,
)


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _brute_grams(text, w):
    toks = text.split() if text else []
    return [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]


def test_window_hashes_never_cross_docs():
    t = pa.chunked_array([pa.array(["a b c", "d e f"])])
    h, row, _ = _token_hashes(t)
    g, grow = _window_hashes(h, row, 2)
    # 2 windows per doc (a b, b c | d e, e f) — never (c, d)
    assert list(grow) == [0, 0, 1, 1]
    # the cross hash would be a window at flat position 2 — absent
    assert len(g) == 4


def test_window_hash_equals_token_sequence_equality():
    t = pa.chunked_array([pa.array(["x y z w", "q x y z w", "x y z z"])])
    h, row, _ = _token_hashes(t)
    g, grow = _window_hashes(h, row, 3)
    texts = ["x y z w", "q x y z w", "x y z z"]
    grams = [gr for i, txt in enumerate(texts) for gr in _brute_grams(txt, 3)]
    assert len(g) == len(grams)
    # equal gram strings <-> equal hashes across the whole batch
    for i in range(len(grams)):
        for j in range(len(grams)):
            assert (grams[i] == grams[j]) == (g[i] == g[j]), (i, j)


def test_decontaminate_planted_overlap():
    bench_doc = "alpha beta gamma delta epsilon zeta eta theta trailing words here"
    clean = "completely different tokens without any overlap at all whatsoever"
    # contains the bench doc's first 8-gram mid-text
    dirty = "prefix junk alpha beta gamma delta epsilon zeta eta theta suffix"
    rows = [(0, bench_doc), (1, clean), (2, dirty), (3, None), (4, "short doc")]
    ds = _ds(rows)
    h, row, _ = _token_hashes(pa.chunked_array([pa.array([bench_doc])]))
    bench = np.sort(_window_hashes(h, row, 8)[0][:1])
    out = decontaminate(ds, bench, w=8).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["hits"]))
    assert got == {0: 1, 2: 1}  # bench doc self-matches; dirty matches; others absent


def test_benchmark_gram_hashes_mod_selection(tmp_path):
    import pyarrow.parquet as pq

    texts = [f"tok{i} a b c d e f g h i j" for i in range(10)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(10), pa.int64()), "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"),
    )
    bench = benchmark_gram_hashes(str(tmp_path), w=8, mod=3)
    # docs 0,3,6,9 qualify; all first grams distinct (tok{i} differs)
    assert len(bench) == 4
    assert np.array_equal(bench, np.sort(bench))


def test_repetition_stats_brute_force():
    rows = [
        (0, "a b a b a b"),          # grams: ab ba ab ba ab -> 5 total, 2 distinct
        (1, "unique tokens only here"),  # 3 grams all distinct
        (2, "solo"),                  # <2 tokens -> absent
        (3, None),                    # null -> absent
        (4, "x x x x"),              # xx xx xx -> 3 total, 1 distinct
    ]
    out = repetition_stats(_ds(rows), w=2).to_pandas().sort_values("doc_id")
    got = {r.doc_id: (r.n_grams, r.n_distinct) for r in out.itertuples()}
    assert got == {0: (5, 2), 1: (3, 3), 4: (3, 1)}
    for doc_id, text in rows:
        grams = _brute_grams(text, 2)
        if grams:
            assert got[doc_id] == (len(grams), len(set(grams)))


def test_decontam_oracle_parity_sf0001():
    """Engine vs DuckDB on the real sf0.001 documents table — the same
    comparison the driver's checker runs."""
    import duckdb

    from fscrawler_ray.pipelines.decontam import ORACLE_SQL, q_decontam_hits, q_repetition_docs

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for name, q in (("decontam_hits", q_decontam_hits), ("repetition_docs", q_repetition_docs)):
        eng = q("/root/testdata/sf0.001").to_pandas()
        ora = con.execute(ORACLE_SQL[name]).df()
        cols = sorted(eng.columns)
        assert cols == sorted(ora.columns), name
        e = eng[cols].sort_values(cols).reset_index(drop=True)
        o = ora[cols].sort_values(cols).reset_index(drop=True)
        assert len(e) == len(o), (name, len(e), len(o))
        for c in cols:
            assert (e[c].to_numpy() == o[c].to_numpy()).all(), (name, c)


def test_boilerplate_planted_spans():
    from fscrawler_ray.pipelines.decontam import boilerplate_gram_hashes

    # the span "lorem ipsum dolor" appears in 3 docs; every other 3-gram
    # is unique to its document
    rows = [
        (1, "alpha beta lorem ipsum dolor gamma"),
        (2, "delta lorem ipsum dolor epsilon zeta"),
        (3, "lorem ipsum dolor eta theta iota"),
        (4, "kappa lambda mu nu xi omicron"),
    ]
    bp = boilerplate_gram_hashes(_ds(rows), w=3, min_docs=3)
    assert len(bp) == 1  # exactly the shared gram
    hits = decontaminate(_ds(rows), bp, w=3, out_col="bp_hits").to_pandas()
    assert sorted(hits["doc_id"]) == [1, 2, 3]
    assert set(hits["bp_hits"]) == {1}
    # threshold not met at min_docs=4
    assert len(boilerplate_gram_hashes(_ds(rows), w=3, min_docs=4)) == 0


def test_boilerplate_distinct_doc_counting_not_occurrences():
    from fscrawler_ray.pipelines.decontam import boilerplate_gram_hashes

    # one doc repeats the span 5 times — still only ONE distinct doc
    rows = [
        (1, "a b c a b c a b c a b c a b c"),
        (2, "d e f g h i"),
    ]
    assert len(boilerplate_gram_hashes(_ds(rows), w=3, min_docs=2)) == 0


def test_boilerplate_partition_invariance():
    from fscrawler_ray.pipelines.decontam import boilerplate_gram_hashes

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab, size=20))) for i in range(60)]
    sets = []
    for parts in (1, 4, 13):
        ds = _ds(rows).repartition(parts)
        sets.append(tuple(boilerplate_gram_hashes(ds, w=3, min_docs=3).tolist()))
    assert sets[0] == sets[1] == sets[2]
    assert len(sets[0]) > 0


def test_dup_spans_planted(tmp_path, ray_session):
    import pyarrow.parquet as pq
    from fscrawler_ray.pipelines.decontam import q_dup_spans_docs

    shared = "X" * 16 + "Y" * 16  # one aligned 32-char window
    # doc 1: shared at pos 0; doc 2: shared at pos 16 (stride-aligned);
    # doc 3: intra-doc repeat of its own window at 0 and 32;
    # doc 4: unique text, no hits; doc 5: too short for any window.
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        shared + "tail of doc one.....",
                        "0123456789abcdef" + shared,
                        "Z" * 32 + "Z" * 32,
                        "completely unique text with no twin beyond here",
                        "short",
                    ]
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = q_dup_spans_docs(str(tmp_path)).to_pandas()
    got = sorted(zip(df["doc_id"], df["pos"]))
    # doc 3's Z-run: windows at 0/16/32 are ALL "Z"*32 → three sites
    assert got == [(1, 0), (2, 16), (3, 0), (3, 16), (3, 32)]


def test_dup_spans_codepoint_alignment(tmp_path, ray_session):
    """Window offsets count CODEPOINTS (DuckDB substr semantics), not
    bytes: a 2-byte char before the shared span must not misalign it."""
    import pyarrow.parquet as pq
    from fscrawler_ray.pipelines.decontam import q_dup_spans_docs

    span = "é" * 16 + "ü" * 16
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([span + "padpadpadpadpadp", "0123456789abcdef" + span]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = q_dup_spans_docs(str(tmp_path)).to_pandas()
    assert sorted(zip(df["doc_id"], df["pos"])) == [(1, 0), (2, 16)]


def test_pii_scrub_kernel(ray_session):
    """Hand-built PII shapes (not the injected exerciser): emails with
    dots/plus tags, phones, IPv4s — scrubbed in the fixed order with
    exact per-category counts."""
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.decontam import pii_scrub

    rows = [
        "write to jane.doe+spam@mail.example.co.uk or bob@x.io thanks",
        "call 555-0199 or 555-12345 from 192.168.0.1",
        "plain text with no pii at all",
        "server 10.0.0.255 and 256.1.1.1 still match the naive rule",
    ]
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()), "text": pa.array(rows)})
    out = pii_scrub(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")

    assert list(out["n_emails"]) == [2, 0, 0, 0]
    assert out["text_clean"].iloc[0] == "write to <EMAIL> or <EMAIL> thanks"
    # 555-12345 must NOT match (trailing digit kills the word boundary)
    assert list(out["n_phones"]) == [0, 1, 0, 0]
    assert "555-12345" in out["text_clean"].iloc[1]
    assert "<PHONE>" in out["text_clean"].iloc[1]
    # naive IPv4 rule: both dotted quads match (documented: no 0-255 range check)
    assert list(out["n_ips"]) == [0, 1, 0, 2]
    assert out["text_clean"].iloc[3] == "server <IP> and <IP> still match the naive rule"


def test_pii_scrub_audit_clean_and_counts(tmp_path):
    """The audit certifies idempotence: planted PII is fully counted at
    scrub time and the re-detection pass over scrubbed text finds zero
    residuals (clean = 1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.decontam import q_pii_scrub_audit

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["plain text"] * 4),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_pii_scrub_audit(str(tmp_path)).to_pandas().iloc[0]
    # doc_id%4 injection: doc1 email; doc2 email+phone; doc3 all three
    assert out["n_docs"] == 4
    assert out["scrubbed_emails"] == 3
    assert out["scrubbed_phones"] == 2
    assert out["scrubbed_ips"] == 1
    assert out["residual_emails"] == out["residual_phones"] == out["residual_ips"] == 0
    assert out["clean"] == 1
