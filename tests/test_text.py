import numpy as np

from fscrawler_ray.functions.phash import hamming64
from fscrawler_ray.functions.text import (
    extract_keywords,
    fingerprint64,
    keywords_batch,
    langid_batch,
    minhash_signatures,
    quality_features,
    rating_batch,
    simhash64,
    token_count_batch,
)


def test_keywords_reference_semantics():
    # '- ' convention, '_' and '.' turn into ', '
    assert extract_keywords("Artist - song_one, two") == ["song", "one", "two"]
    # bracket convention
    assert extract_keywords("photo [beach, sunset]") == ["beach", "sunset"]
    # no convention
    assert extract_keywords("plain name") == []
    # punctuation outside [a-zA-Z0-9,\s\]] rejects the part
    assert extract_keywords("x - bad!part, here") == []
    assert keywords_batch(["a [x, y]", "nope"]).to_pylist() == [["x", "y"], []]


def test_rating_cap_and_fallback():
    got = rating_batch(["a+++b", "none", "++++++++", "zero"], ["x", "/p/++/y", "z", "w"]).to_pylist()
    assert got == [3, 2, 5, None]


def test_token_count():
    assert token_count_batch(["a b  c", "", " x "]).to_pylist() == [3, 0, 1]


def test_langid():
    texts = [
        "the cat and the dog went to the market",
        "le chat est dans la maison avec le chien",
        "der hund ist nicht mit der katze da",
        "el perro con una casa para los gatos",
        "我是一只猫，我有很多朋友",
    ]
    assert langid_batch(texts).to_pylist() == ["en", "fr", "de", "es", "zh"]


def test_quality_features_monotonic():
    t = quality_features(["word " * 200, "!!!"])
    scores = t.column("quality_score").to_pylist()
    assert scores[0] > scores[1]
    assert t.column("n_tokens").to_pylist() == [200, 1]


def test_minhash_similarity_orders():
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = a.replace("dog", "cat")
    c = "entirely different content about distributed stream processing engines"
    sig = minhash_signatures([a, b, c], num_perm=64)
    near = (sig[0] == sig[1]).mean()
    far = (sig[0] == sig[2]).mean()
    assert near > far
    assert near > 0.3


def test_simhash_and_fingerprint():
    s = simhash64(["a b c d e f g h", "a b c d e f g x", "unrelated totally different words"])
    assert hamming64(s[0:1], s[1:2])[0] < hamming64(s[0:1], s[2:3])[0]
    fp = fingerprint64(["a b c d", "a b c d", "e f g h", ""])
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert fp[3] == 0


def test_chunk_documents_edges_and_coverage():
    """Sliding-window chunking: edge lengths (empty, single-token, below
    overlap, exact boundary, boundary+1) and full-token coverage with the
    right overlap between consecutive chunks."""
    import pyarrow as pa
    import ray

    from fscrawler_ray.pipelines.textops import chunk_documents

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["", "solo", words(16), words(64), words(65), "  a   b  "]),
        }
    )
    out = (
        chunk_documents(ray.data.from_arrow(t), chunk_tokens=64, overlap=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    per_doc = out.groupby("doc_id")["chunk_id"].count().to_dict()
    assert per_doc == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}  # doc 0 (empty) emits none
    assert out[out["doc_id"] == 5]["chunk_text"].iloc[0] == "a b"  # runs of spaces collapse
    d4 = out[out["doc_id"] == 4]
    assert list(d4["chunk_tokens"]) == [64, 17]
    c0, c1 = d4["chunk_text"].iloc[0].split(" "), d4["chunk_text"].iloc[1].split(" ")
    assert c0[48:] == c1[:16]  # 16-token overlap
    assert c1[-1] == "w64"  # tail covered

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_arrow(t), chunk_tokens=8, overlap=8)


def test_build_vocab_deterministic_ties_and_partition_invariance():
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.textops import build_vocab

    rows = ["b a a c", "c b", "d d d"] * 7  # counts: a=14? deterministic ties
    for parts in (1, 5):
        ds = ray.data.from_arrow(pa.table({"text": pa.array(rows)})).repartition(parts)
        v = build_vocab(ds, 3).to_pylist()
        # counts: a 14, b 14, c 14, d 21 → top3 = d, then a,b (tok asc among ties)
        assert v == ["d", "a", "b"]


def test_pack_sequences_bins_are_contiguous_and_budgeted(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import q_pack_sequences

    rng = np.random.default_rng(6)
    texts = [" ".join(["t"] * int(k)) for k in rng.integers(1, 40, size=200)]
    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 200),
            "source": pa.array(["s"] * 200),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_pack_sequences(str(tmp_path), budget=100).to_pandas().sort_values("doc_id")
    lens = np.array([len(x.split()) for x in texts])
    prefix = np.concatenate([[0], np.cumsum(lens)[:-1]])
    assert (out["bin"].to_numpy() == prefix // 100).all()
    # bins are contiguous in doc order and non-decreasing
    b = out["bin"].to_numpy()
    assert (np.diff(b) >= 0).all()


def test_vocab_coverage_drops_zero_token_docs(tmp_path):
    """Empty/whitespace-only/null text: absent from the oracle's unnest —
    must be absent from the engine output too."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import ORACLE_SQL, q_vocab_coverage

    texts = ["a b a", "", "b c", None, "   "]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([len(x) if x else 0 for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = q_vocab_coverage(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(ORACLE_SQL["vocab_coverage"]).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist() == [0, 2]
    assert got["in_vocab"].tolist() == want["in_vocab"].tolist()
    assert got["oov"].tolist() == want["oov"].tolist()


def test_lm_score_matches_driver_reference(tmp_path):
    """Distributed bigram-LM scoring ≡ a plain-python add-alpha reference."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import q_lm_score_docs

    rng = np.random.default_rng(8)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 12))) for _ in range(40)]
    texts.append("aa")  # single-token doc: no bigram → absent from output
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = q_lm_score_docs(str(tmp_path), alpha=0.1).to_pandas().set_index("doc_id")["avg_logprob"]

    # reference model over token strings
    uni: dict = {}
    bi: dict = {}
    for x in texts:
        toks = x.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    want = {}
    for i, x in enumerate(texts):
        toks = x.split()
        if len(toks) < 2:
            continue
        lps = [
            math.log((bi.get((a, b), 0) + 0.1) / (uni[a] + 0.1 * V))
            for a, b in zip(toks, toks[1:])
        ]
        want[i] = sum(lps) / len(lps)
    assert set(got.index) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-5, i


def test_normalize_docs_canonicalizes(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import q_normalize_docs

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["  Héllo\t\tWörld  ", "MIXED   Case x", "中文  TEXT"]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    import unicodedata

    out = q_normalize_docs(str(tmp_path)).to_pandas().sort_values("doc_id")
    want = [unicodedata.normalize("NFC", w) for w in ["héllo wörld", "mixed case x", "中文 text"]]
    assert list(out["norm_text"]) == want
    assert list(out["n_chars_norm"]) == [11, 12, 7]


def test_collocations_finds_planted_bigram(tmp_path, ray_session):
    """A bigram that always co-occurs must out-PMI frequent-but-
    independent pairs; min-count floor drops rare pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import q_collocations

    rng = __import__("numpy").random.default_rng(3)
    common = ["the", "a", "data", "row", "table"]
    docs = []
    for i in range(40):
        toks = list(rng.choice(common, 20))
        toks += ["hong", "kong"]  # planted collocation, always adjacent
        docs.append(" ".join(toks))
    docs.append("rare pair")  # below min_count
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = q_collocations(str(tmp_path), k=10).to_pandas()
    top = out.sort_values("pmi_micro", ascending=False).iloc[0]
    assert (top["x"], top["y"]) == ("hong", "kong")
    assert not ((out["x"] == "rare") & (out["y"] == "pair")).any()


def test_lm_buckets_are_balanced_terciles(ray_session):
    from fscrawler_ray.pipelines.textops import q_lm_buckets, q_lm_score_docs

    sf = "/root/testdata/sf0.001"
    b = q_lm_buckets(sf).to_pandas()
    sizes = b["bucket"].value_counts()
    assert set(sizes.index) == {"head", "middle", "tail"}
    assert sizes.max() - sizes.min() <= 1
    s = q_lm_score_docs(sf).to_pandas()
    m = b.merge(s, on="doc_id")
    means = m.groupby("bucket")["avg_logprob"].mean()
    assert means["head"] > means["middle"] > means["tail"]


def test_source_kl_detects_lexical_outlier(tmp_path, ray_session):
    """A source with disjoint vocabulary has much higher KL than sources
    drawn from the shared distribution; KL is always >= 0 up to
    quantization."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import q_source_kl

    rng = __import__("numpy").random.default_rng(11)
    common = ["alpha", "beta", "gamma", "delta", "eps"]
    docs, srcs = [], []
    for i in range(30):
        docs.append(" ".join(rng.choice(common, 30)))
        srcs.append("mainstream%d" % (i % 3))
    for i in range(10):
        docs.append(" ".join(["zork", "quux", "blorp"] * 10))
        srcs.append("outlier")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
                "source": pa.array(srcs),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = q_source_kl(str(tmp_path)).to_pandas().set_index("source")["kl_micro"]
    assert (out >= -3).all(), out  # ≥ 0 up to per-term quantization
    assert out["outlier"] > 3 * max(out[s] for s in out.index if s != "outlier")


def test_gopher_flags_rules():
    """Each Gopher rule trips on its crafted violator and passes on a
    clean document; the flags are exact integers (no float thresholds)."""
    import pyarrow as pa

    from fscrawler_ray.pipelines.textops import gopher_flag_batch

    clean = "the quick brown fox jumps over a lazy dog " * 8  # 72 words, the+a
    short = "the a fox"  # < 50 words
    symbolic = ("# " * 30 + "the a word ") * 2  # symbol ratio > 0.1
    bullets = "\n".join("- the a item %d word word word word" % i for i in range(8))
    ellipses = "\n".join("the a line %d word word..." % i for i in range(10))
    numeric = "the a " + " ".join(str(i) for i in range(60))  # <80% alpha words
    longwords = "the a " + " ".join(["x" * 40] * 60)  # mean word len > 10
    t = gopher_flag_batch(
        pa.array([clean, short, symbolic, bullets, ellipses, numeric, longwords])
    )
    flags = {c: t.column(c).to_pylist() for c in t.column_names}
    assert flags["gopher_pass"][0] == 1
    assert flags["r_word_count"][1] == 0
    assert flags["r_symbol"][2] == 0
    assert flags["r_bullet"][3] == 0
    assert flags["r_ellipsis"][4] == 0
    assert flags["r_alpha"][5] == 0
    assert flags["r_mean_len"][6] == 0
    assert flags["r_stop"][0] == 1 and all(
        f == 0 for f in gopher_flag_batch(pa.array(["zork " * 60])).column("r_stop").to_pylist()
    )
    # every flag column is int64 0/1
    for c in t.column_names:
        assert t.column(c).type == pa.int64()


def test_gopher_flags_duckdb_parity_fuzz():
    """RE2-parity fuzz: gopher_flag_batch's counts/flags equal DuckDB's
    regexp replay on adversarial text (bullets, ellipses, unicode
    ellipsis, newlines, '#', digit words, stopwords) — the same SQL the
    oracle net runs, exercised on inputs the synthetic corpus never
    produces."""
    import duckdb
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from fscrawler_ray.pipelines.textops import ORACLE_SQL

    sql = ORACLE_SQL["gopher_rules"]

    frag = st.sampled_from(
        ["the", "a", "word", "123", "#", "...", "…", "-", "•", "\n", " ", "x" * 12, "fox9", "of", "with"]
    )
    doc = st.lists(frag, min_size=0, max_size=120).map(" ".join)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        from fscrawler_ray.pipelines.textops import gopher_flag_batch

        eng = gopher_flag_batch(pa.array(texts, pa.string())).to_pandas()
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "source": pa.array(["s"] * len(texts)),
                    "text": pa.array(texts, pa.string()),
                }
            ),
        )
        want = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
        for c in ["n_words", "r_word_count", "r_mean_len", "r_symbol", "r_bullet",
                  "r_ellipsis", "r_alpha", "r_stop", "gopher_pass"]:
            assert list(eng[c]) == list(want[c]), (c, texts)

    run()


def test_corpus_datacard_planted(tmp_path, ray_session):
    """Planted corpus: dup tallies, token totals and median reflect the
    exact construction (2 dup copies, known token counts)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.textops import q_corpus_datacard

    texts = ["a b c", "a b c", "one two", "x", "x y z w"]
    langs = ["en", "en", "en", "fr", "fr"]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_corpus_datacard(str(tmp_path)).to_pandas().set_index("lang")
    assert out.loc["en", "n_docs"] == 3
    assert out.loc["en", "distinct_texts"] == 2
    assert out.loc["en", "dup_docs"] == 1
    assert out.loc["en", "total_tokens"] == 8
    assert out.loc["fr", "dup_docs"] == 0
    assert out.loc["fr", "total_tokens"] == 5
    assert out.loc["fr", "p50_chars"] == 1  # rank ceil(0.5*2)=1 -> size 1
    assert out.loc["en", "mean_chars"] == (5 + 5 + 7) // 3


def test_readability_docs_known_values(tmp_path):
    """Flesch-Kincaid micros: hand-computed grades for planted texts
    (simple one-syllable prose vs polysyllabic run-on), trunc-division
    semantics on a negative grade."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    from fscrawler_ray.pipelines.textops import q_readability_docs

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # W=4 T=1 S=4: grade = .39*4 + 11.8*1 - 15.59 = -2.23
                    "the cat sat up.",
                    # W=3 T=1, syllables: con-sti-tu-tion-al(5)+e-du-ca-tion(4)+boo(1)=10
                    "constitutional education boo!",
                    # no sentence marks -> T floored at 1; vowel-less word
                    # counts one syllable: W=2 S=2 (bcd + the)
                    "bcd the",
                ]
            ),
            "lang": pa.array(["en", "en", "en"]),
            "source": pa.array(["s", "s", "s"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (
        q_readability_docs(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    def fk(w, t, s):
        num = 390_000 * w * w + 11_800_000 * s * t - 15_590_000 * t * w
        den = t * w
        q, r = divmod(abs(num), den)
        return q * (1 if num >= 0 else -1)

    assert out.loc[1, "n_words"] == 4 and out.loc[1, "n_syllables"] == 4
    assert out.loc[1, "fk_grade_micro"] == fk(4, 1, 4) < 0
    assert out.loc[2, "n_syllables"] == 10
    assert out.loc[2, "fk_grade_micro"] == fk(3, 1, 10)
    assert out.loc[3, "n_sentences"] == 1 and out.loc[3, "n_syllables"] == 2
    assert out.loc[3, "fk_grade_micro"] == fk(2, 1, 2)
