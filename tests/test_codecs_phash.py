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
