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
