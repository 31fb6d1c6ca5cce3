import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fscrawler_ray.functions.hashing import xxh64, xxh64_batch, xxh64_u64


def test_spec_vector_empty():
    # published XXH64 test vector (xxHash spec): empty input, seed 0
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_batch_matches_scalar_basic():
    samples = [b"", b"a", b"abc", b"0" * 31, b"0" * 32, b"0" * 33, b"x" * 100]
    got = xxh64_batch(pa.array(samples, type=pa.binary()))
    want = np.array([xxh64(s) for s in samples], dtype=np.uint64)
    assert (got == want).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=60), st.integers(0, 2**32))
def test_batch_matches_scalar_fuzz(samples, seed):
    got = xxh64_batch(pa.array(samples, type=pa.binary()), seed=seed)
    want = np.array([xxh64(s, seed) for s in samples], dtype=np.uint64)
    assert (got == want).all()


def test_strings_and_slices():
    arr = pa.array([f"http://h{i}.com/p{i}" for i in range(100)])
    full = xxh64_batch(arr)
    sl = xxh64_batch(arr.slice(10, 30))
    assert (sl == full[10:40]).all()
    assert full[0] == xxh64("http://h0.com/p0")


def test_u64_kernel():
    ks = np.array([0, 1, 2**63, 2**64 - 1, 424242], dtype=np.uint64)
    want = np.array([xxh64(int(k).to_bytes(8, "little")) for k in ks], dtype=np.uint64)
    assert (xxh64_u64(ks) == want).all()
    # distinct seeds give distinct hash functions
    assert (xxh64_u64(ks, seed=1) != xxh64_u64(ks, seed=2)).any()
