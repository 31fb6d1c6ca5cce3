

def test_id3_roundtrip_and_malformed():
    """make → RIFF-embed → extract is the identity; junk is rejected, and
    the id3_batch stage nulls rows without a tag instead of failing."""
    import pyarrow as pa
    import pytest

    from fscrawler_ray.stages.multimodal import (
        embed_id3_riff,
        extract_id3_riff,
        id3_batch,
        id3_fields_for,
        make_id3v2,
        synth_wav_table,
    )

    t = synth_wav_table(8)
    for i, buf in enumerate(t.column("bytes").to_pylist()):
        title, artist, year = id3_fields_for(i)
        got = extract_id3_riff(buf)
        assert got == {"title": title, "artist": artist, "year": year}
    with pytest.raises(ValueError):
        extract_id3_riff(b"junkbytesnotriff")
    # a tagless WAV yields null columns through the stage
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 16)
    mixed = pa.table(
        {"media_id": ["a", "b"], "bytes": pa.array([t.column("bytes")[0].as_py(), bio.getvalue()], pa.binary())}
    )
    out = id3_batch(mixed)
    assert out.column("id3_year").to_pylist()[1] is None
    assert out.column("id3_artist").to_pylist()[0] == id3_fields_for(0)[1]
    # embed is self-consistent on a fresh tag
    tag = make_id3v2("T", "A", 2001)
    assert extract_id3_riff(embed_id3_riff(bio.getvalue(), tag)) == {"title": "T", "artist": "A", "year": 2001}
