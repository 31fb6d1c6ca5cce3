import numpy as np
import pytest

from fscrawler_ray.functions.codecs import (
    FORMATS,
    LOSSY,
    decode,
    encode,
    psnr,
    sniff_format,
    synth_image,
)
from fscrawler_ray.functions.phash import hamming64, phash_batch, phash_image, to_gray32


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_psnr_invariant(fmt):
    img = synth_image(7, 120, 90)
    buf = encode(img, fmt)
    out, w, h, f = decode(buf)
    assert (w, h, f) == (120, 90, fmt)
    if fmt in LOSSY:
        assert psnr(img, out) >= 40.0  # the input_hint per-row invariant
    else:
        assert (img == out).all()


def test_sniff_magic_bytes():
    img = synth_image(1, 16, 16)
    assert sniff_format(encode(img, "png")) == "png"
    assert sniff_format(encode(img, "jpeg")) == "jpeg"
    assert sniff_format(encode(img, "webp")) == "webp"
    assert sniff_format(b"garbage") is None


def test_decode_junk_raises():
    with pytest.raises(ValueError):
        decode(b"not an image at all")


def test_determinism():
    a = encode(synth_image(5, 64, 48), "jpeg")
    b = encode(synth_image(5, 64, 48), "jpeg")
    assert a == b


def test_phash_near_vs_far():
    a = synth_image(1, 128, 128)
    b = synth_image(2, 128, 128)
    pa_ = phash_image(a)
    pa_lossy = phash_image(decode(encode(a, "jpeg"))[0])
    pb = phash_image(b)
    near = hamming64(np.array([pa_]), np.array([pa_lossy]))[0]
    far = hamming64(np.array([pa_]), np.array([pb]))[0]
    assert near <= 6
    assert far >= 16


def test_phash_batch_matches_single():
    imgs = [synth_image(i, 64, 64) for i in range(8)]
    grays = np.stack([to_gray32(im) for im in imgs])
    batch = phash_batch(grays)
    singles = np.array([phash_image(im) for im in imgs])
    assert (batch == singles).all()


def test_reencode_reconstruction_matches_decode():
    """The fast quantize-reconstruct path must be BIT-identical to a real
    encode→decode round-trip for every format."""
    import numpy as np

    from fscrawler_ray.functions.codecs import decode, encode, reencode_reconstruction, synth_image

    for fmt in ("png", "jpeg", "webp"):
        for seed in (1, 99, 12345):
            img = synth_image(seed, 80, 64)
            via_codec = decode(encode(img, fmt))[0]
            fast = reencode_reconstruction(img, fmt)
            assert np.array_equal(via_codec, fast), fmt


def test_phash_dedup_keep_best(ray_session):
    import pyarrow as pa

    import ray as _ray

    from fscrawler_ray.pipelines.dedup import phash_dedup_keep_best

    # group 7: three copies, the 100x80 one wins; group 9: resolution tie
    # between b1/b2 → min image_id; singleton group 5 keeps itself
    t = pa.table(
        {
            "image_id": pa.array(["a1", "a2", "a3", "b2", "b1", "c"]),
            "phash": pa.array([7, 7, 7, 9, 9, 5], pa.int64()),
            "w": pa.array([10, 100, 50, 20, 20, 8], pa.int32()),
            "h": pa.array([10, 80, 50, 20, 20, 8], pa.int32()),
        }
    )
    df = phash_dedup_keep_best(_ray.data.from_arrow(t)).to_pandas().set_index("phash")
    assert df.loc[7, "keeper_image_id"] == "a2" and df.loc[7, "ties"] == 1
    assert df.loc[9, "keeper_image_id"] == "b1" and df.loc[9, "ties"] == 2
    assert df.loc[5, "keeper_image_id"] == "c"


def test_exif_analog_roundtrip_and_stage(ray_session):
    """The EXIF-analog segment: embeds as each container's real metadata
    shape, never perturbs decoded pixels, parses back exactly, and the
    stage derives the same fields the generator committed to image_id."""
    import numpy as np
    import pyarrow as pa

    from fscrawler_ray.functions.codecs import (
        decode,
        encode,
        extract_exif,
        pack_exif,
        parse_exif,
        synth_image,
    )
    from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig, exif_fields_for
    from fscrawler_ray.stages.image_stages import exif_batch

    img = synth_image(7, 56, 40)
    for fmt in ("png", "jpeg", "webp"):
        ex = pack_exif(3, "Crater Pro", 1_650_000_000_000_000)
        b1, b0 = encode(img, fmt, exif=ex), encode(img, fmt)
        assert (decode(b1)[0] == decode(b0)[0]).all()
        assert parse_exif(extract_exif(b1)) == {
            "orientation": 3,
            "camera": "Crater Pro",
            "captured_at_us": 1_650_000_000_000_000,
        }
        assert extract_exif(b0) is None

    cfg = WebConfig(seed=7, n_hosts=4, max_depth=3, fanout_dirs=2, fanout_files=6)
    web = SynthWeb(cfg)
    rows = []
    for url in web.children("http://host00.example.com/"):
        r = web.fetch(url)
        if r:
            rows.append(r)
    assert rows
    t = pa.table(
        {"image_id": [r["image_id"] for r in rows], "bytes": [r["bytes"] for r in rows]}
    )
    out = exif_batch(t)
    for i in range(len(rows)):
        ps40 = int(rows[i]["image_id"][4:], 16)
        o, cam, ts = exif_fields_for(ps40)
        assert out.column("exif_orientation")[i].as_py() == o
        assert out.column("exif_camera")[i].as_py() == cam
        assert out.column("exif_captured_at_us")[i].as_py() == ts
    # malformed payload → nulls, not exceptions
    bad = exif_batch(pa.table({"image_id": ["x"], "bytes": [b"not an image"]}))
    assert bad.column("exif_orientation")[0].as_py() is None


def test_iptc_pack_parse_roundtrip_and_coexistence():
    """IIM pack → parse identity; EXIF + IPTC coexist in ONE metadata slot
    (parse_exif reads its fixed block, extract_iptc the trailing stream);
    malformed streams are rejected."""
    import numpy as np

    from fscrawler_ray.functions import codecs

    got = codecs.parse_iptc(codecs.pack_iptc("Scene 1", ["urban", "night"], "A. Stone"))
    assert got == {"caption": "Scene 1", "keywords": ["urban", "night"], "byline": "A. Stone"}
    assert codecs.parse_iptc(b"\x1b junk") is None
    assert codecs.parse_iptc(b"") is None
    img = np.zeros((8, 8, 3), np.uint8)
    meta = codecs.pack_exif(3, "Crater Pro", 123456) + codecs.pack_iptc("Scene 9", ["macro"], "C. Vega")
    for fmt in ("png", "jpeg", "webp"):
        buf = codecs.encode(img, fmt, exif=meta)
        ex = codecs.parse_exif(codecs.extract_exif(buf))
        assert ex == {"orientation": 3, "camera": "Crater Pro", "captured_at_us": 123456}
        ip = codecs.extract_iptc(buf)
        assert ip == {"caption": "Scene 9", "keywords": ["macro"], "byline": "C. Vega"}
        codecs.decode(buf)  # pixel body offset still correct with both blocks


def test_metadata_extractors_null_on_corrupt_containers():
    """Truncated/corrupt metadata segments must yield None, never raise
    (one corrupt payload must not kill a whole map_batches task):
    bogus declared lengths, headers cut mid-field, non-UTF8 text."""
    import struct

    from fscrawler_ray.functions import codecs

    cases = [
        # PNG eXIf chunk declaring a length far past the buffer
        codecs.MAGIC["png"] + struct.pack(">I", 0x7FFFFFFF) + b"eXIf" + b"xx",
        # WebP cut off right after the EXIF tag (length field missing)
        codecs.MAGIC["webp"] + struct.pack("<I", 12) + b"WEBPEXIF",
        # WebP EXIF whose declared length overruns the buffer
        codecs.MAGIC["webp"] + struct.pack("<I", 20) + b"WEBPEXIF" + struct.pack("<I", 999) + b"ab",
        # JPEG APP1 marker with no length bytes
        codecs.MAGIC["jpeg"] + b"\xff\xe1",
    ]
    for buf in cases:
        assert codecs.extract_exif(buf) is None
        assert codecs.extract_iptc(buf) is None
    # non-UTF8 dataset text → None, not UnicodeDecodeError
    assert codecs.parse_iptc(b"\x1c\x02\x78\x00\x02\xff\xfe") is None
    bad_cam = codecs._EXIF_TIFF + codecs._EXIF_FIXED.pack(3, 2, 123) + b"\xff\xfe"
    assert codecs.parse_exif(bad_cam) is None


def test_phash_search_radius(ray_session):
    """Broadcast Hamming probe: finds planted flips within the radius,
    excludes flips beyond it; self-match at dist 0; popcount exact."""
    import numpy as np
    import pyarrow as pa
    import ray

    from fscrawler_ray.pipelines.similarity import _popcount64, phash_search

    base = np.uint64(0xDEADBEEFCAFEF00D)

    def flip(h, bits):
        x = np.uint64(h)
        for b in bits:
            x ^= np.uint64(1) << np.uint64(b)
        return np.int64(x)

    rows = [
        ("a-query", np.int64(base)),
        ("b-near", flip(base, range(3))),       # dist 3 → hit
        ("c-edge", flip(base, range(10))),      # dist 10 → hit (<= radius)
        ("d-far", flip(base, range(11))),       # dist 11 → miss
        ("e-opposite", np.int64(~base)),        # dist 64 → miss
    ]
    t = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "phash": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = phash_search(ray.data.from_arrow(t), n_queries=1, radius=10).to_pandas()
    got = dict(zip(out["image_id"], out["dist"]))
    assert got == {"a-query": 0, "b-near": 3, "c-edge": 10}
    assert (out["query_id"] == "a-query").all()

    # SWAR popcount ≡ int.bit_count on random uint64s
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 2**63, size=1000, dtype=np.int64).view(np.uint64)
    assert (_popcount64(xs) == [int(x).bit_count() for x in xs]).all()
