"""BPE trainer: parity with the textbook Sennrich reference implementation,
left-to-right merge-overlap semantics, and block-structure invariance."""

import collections
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _ref_bpe(texts: list[str], k: int):
    """Sennrich et al. 2016 reference trainer (tuple-of-symbols words),
    tie-broken (count desc, lhs asc, rhs asc) like the engine."""
    vocab = collections.Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            vocab[tuple(w) + ("</w>",)] += 1
    merges = []
    for _ in range(k):
        stats = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges, vocab


def _mini_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_bpe_matches_reference_trainer(tmp_path, ray_session):
    from fscrawler_ray.pipelines.bpe import train_bpe

    texts = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest new new",
        "the cat sat on the mat the cat",
    ]
    k = 8
    got, _ = train_bpe(_mini_docs(tmp_path, texts), k=k)
    want = _ref_bpe(texts, k)[0]
    rows = got.to_pylist()
    assert [(r["lhs"], r["rhs"], r["cnt"]) for r in rows] == want
    assert [r["step"] for r in rows] == list(range(1, k + 1))


def test_bpe_overlap_left_to_right(tmp_path, ray_session):
    """'aaa' under merge (a,a) must become (aa)(a), never (a)(aa) — BPE's
    left-to-right non-overlapping scan on both engine and reference."""
    from fscrawler_ray.pipelines.bpe import train_bpe

    texts = ["aaa aaa aaa aaa b b"]
    merges, words = train_bpe(_mini_docs(tmp_path, texts), k=1)
    rows = merges.to_pylist()
    assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["cnt"]) == ("a", "a", 8)
    segs = set(words.to_pandas()["s"])
    assert "(aa)(a)(</w>)" in segs  # NOT "(a)(aa)(</w>)"
    assert _ref_bpe(texts, 1)[0] == [(r["lhs"], r["rhs"], r["cnt"]) for r in rows]


def test_bpe_vocab_counts(tmp_path, ray_session):
    """Final symbol inventory matches the reference vocab's symbol tally."""
    from fscrawler_ray.pipelines.bpe import q_bpe_vocab

    texts = ["low lower lowest", "low slow glow flow", "best rest west"]
    d = _mini_docs(tmp_path, texts)
    got = {
        r["sym"]: r["cnt"] for r in q_bpe_vocab(d).to_pandas().to_dict("records")
    }
    _, vocab = _ref_bpe(texts, 10)
    want = collections.Counter()
    for syms, f in vocab.items():
        for s in syms:
            want[s] += f
    assert got == dict(want)


def test_bpe_block_invariance(ray_session):
    """Same learned merges whatever the input block structure (per-block
    partials feed split-independent Sum aggregates)."""
    import ray

    from fscrawler_ray.pipelines.bpe import train_bpe

    a, _ = train_bpe(SF, k=4)

    orig = ray.data.read_parquet

    def shredded(path, **kw):
        return orig(path, override_num_blocks=13, **kw)

    ray.data.read_parquet = shredded
    try:
        b, _ = train_bpe(SF, k=4)
    finally:
        ray.data.read_parquet = orig
    assert a.to_pylist() == b.to_pylist()


def test_bpe_encode_matches_reference(tmp_path, ray_session):
    """Per-doc subword counts under the learned merges match a row-by-row
    reference encode (train + apply on the same tiny corpus)."""
    from fscrawler_ray.pipelines.bpe import q_bpe_encode_docs

    texts = [
        "low low lower newest newest",
        "the newest widest low",
        "",                      # zero-word doc → all-zero row
        "zz top zz top zz",
    ]
    d = _mini_docs(tmp_path, texts)
    got = (
        q_bpe_encode_docs(d, k=6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    merges, vocab = _ref_bpe(texts, 6)
    order = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def encode_word(w):
        syms = list(w) + ["</w>"]
        while True:
            best, bi = None, None
            for i in range(len(syms) - 1):
                r = order.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                return syms
            a, b = syms[bi], syms[bi + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out

    for doc_id, t in enumerate(texts):
        words = re.findall(r"[a-z]+", t.lower())
        row = got[got["doc_id"] == doc_id].iloc[0]
        assert int(row["n_words"]) == len(words)
        assert int(row["n_chars"]) == sum(len(w) for w in words)
        # engine counts subwords EXCLUDING the </w> marker symbol per word
        want_sub = sum(
            len([s for s in encode_word(w) if s != "</w>"]) for w in words
        )
        assert int(row["n_subwords"]) == want_sub, (doc_id, t)


def test_driver_and_distributed_rounds_identical(tmp_path):
    """The small-vocab driver fast path and the distributed partial-argmax
    rounds learn merge-for-merge identical tokenizers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.bpe import train_bpe

    docs = [
        "low lower lowest newer newest wide wider widest",
        "low low low newer newer wide wide wide wide",
        "the lowest of the low the widest of the wide",
    ] * 4
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}),
        tmp_path / "documents.parquet",
    )
    m_fast, w_fast = train_bpe(str(tmp_path), k=8, driver_vocab_limit=100_000)
    m_dist, w_dist = train_bpe(str(tmp_path), k=8, driver_vocab_limit=0)
    assert m_fast.to_pydict() == m_dist.to_pydict()
    f = w_fast.to_pandas().sort_values("s").reset_index(drop=True)
    d = w_dist.to_pandas().sort_values("s").reset_index(drop=True)
    assert f.equals(d)
