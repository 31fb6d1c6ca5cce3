"""ExactStore spill behavior + SeenSet equivalence under tiny memory bounds,
and trace parity when shards run with a spilling exact store."""

import numpy as np

from fscrawler_ray.state.seen import ExactStore, SeenSet


def test_exact_store_spills_and_answers():
    es = ExactStore(max_inmem=50, max_runs=2)
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 2**63, 3000).astype(np.uint64))
    for i in range(0, len(keys), 97):
        es.add_array(keys[i : i + 97])
    assert len(es._runs) >= 1  # it actually spilled
    assert es.contains_array(keys).all()
    other = np.unique(rng.integers(0, 2**63, 500).astype(np.uint64))
    other = other[~np.isin(other, keys)]
    assert not es.contains_array(other).any()
    assert len(es) == len(keys)
    # delete from a spilled run
    es.discard(int(keys[0]))
    assert not es.contains_array(keys[:1])[0]
    assert len(es) == len(keys) - 1


def test_seenset_spilling_equivalent_to_unbounded():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, 4000).astype(np.uint64)
    a = SeenSet(capacity=1 << 14)
    b = SeenSet(capacity=1 << 14, exact_max_inmem=64)
    for i in range(0, len(keys), 151):
        batch = keys[i : i + 151]
        ra = a.check_and_add(batch)
        rb = b.check_and_add(batch)
        assert (ra == rb).all()
    assert len(a) == len(b)
    assert sorted(a.keys_array().tolist()) == sorted(b.keys_array().tolist())
    # state roundtrip preserves spilled runs
    b2 = SeenSet.from_state(b.state())
    assert len(b2) == len(b)
    assert b2.contains_many(keys).all()


def test_seenset_cuckoo_overflow_grows_in_strict_mode():
    """ADVICE r01: 40k unique keys into a capacity-1<<10 SeenSet used to
    crash with 'cuckoo filter full'. Strict mode must rebuild at 2x from
    the exact store and stay correct."""
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 2**63, 40_000).astype(np.uint64))
    s = SeenSet(capacity=1 << 10, strict=True)
    for i in range(0, len(keys), 1024):
        new = s.check_and_add(keys[i : i + 1024])
        assert new.all()  # all unique -> all new
    assert len(s) == len(keys)
    assert s.contains_many(keys).all()
    # the cuckoo actually grew past its initial sizing
    assert s.cuckoo.n_buckets * s.cuckoo.bucket_size > (1 << 10)
    # re-adding reports all seen
    assert not s.check_and_add(keys[:2048]).any()


def test_seenset_cuckoo_overflow_degrades_in_nonstrict_mode():
    """Non-strict mode has no exact authority to rebuild from: on overflow
    it stops feeding the cuckoo and degrades to bloom-only membership
    (one-sided: never a false negative), instead of killing the shard."""
    rng = np.random.default_rng(4)
    keys = np.unique(rng.integers(0, 2**63, 40_000).astype(np.uint64))
    s = SeenSet(capacity=1 << 10, strict=False)
    for i in range(0, len(keys), 1024):
        s.check_and_add(keys[i : i + 1024])
    assert s._cuckoo_degraded
    # one-sided guarantee: every added key still reports seen
    assert s.contains_many(keys).all()
    assert not s.check_and_add(keys).any()
    # state roundtrip preserves the degraded flag
    s2 = SeenSet.from_state(s.state())
    assert s2._cuckoo_degraded
    assert s2.contains_many(keys).all()


def test_exact_store_disk_backed_runs(tmp_path):
    """spill_dir backs sorted runs with mmapped .npy files — answers must
    be identical to the in-RAM store and files must actually exist."""
    import os

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 2**63, 5000).astype(np.uint64))
    ram = ExactStore(max_inmem=128, max_runs=3)
    disk = ExactStore(max_inmem=128, max_runs=3, spill_dir=str(tmp_path / "runs"))
    for i in range(0, len(keys), 333):
        ram.add_array(keys[i : i + 333])
        disk.add_array(keys[i : i + 333])
    assert (ram.contains_array(keys) == disk.contains_array(keys)).all()
    assert len(ram) == len(disk) == len(keys)
    files = os.listdir(tmp_path / "runs")
    assert files, "no spill files written"
    # runs are memory-mapped, not heap arrays
    assert any(getattr(r, "base", None) is not None or isinstance(r, np.memmap) for r in disk._runs)
    other = np.unique(rng.integers(0, 2**63, 500).astype(np.uint64))
    other = other[~np.isin(other, keys)]
    assert not disk.contains_array(other).any()
    disk.discard(int(keys[0]))
    assert not disk.contains_array(keys[:1])[0]


def test_seenset_fuzz_against_python_set_model():
    """Model-based fuzz: random interleavings of check_and_add / delete /
    contains must agree with a plain python-set reference model, across
    spill bounds, tiny cuckoo capacities (forcing growth), and deletes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.lists(
        st.tuples(st.sampled_from(["add", "del", "has"]),
                  st.lists(st.integers(0, 400), min_size=1, max_size=40)),
        min_size=1, max_size=12),
        st.integers(0, 2**32))
    def check(ops, salt):
        s = SeenSet(capacity=1 << 6, exact_max_inmem=32)  # tiny: spill + growth
        model: set[int] = set()
        for op, raw in ops:
            keys = (np.array(raw, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    + np.uint64(salt))
            if op == "add":
                new = s.check_and_add(keys)
                # first occurrence of an unseen key → True
                expect = []
                batch_seen = set()
                for k in keys.tolist():
                    expect.append(k not in model and k not in batch_seen)
                    batch_seen.add(k)
                model.update(batch_seen)
                assert new.tolist() == expect
            elif op == "del":
                s.delete_many(keys)
                model.difference_update(keys.tolist())
            else:
                got = s.contains_many(keys)
                want = [k in model for k in keys.tolist()]
                assert got.tolist() == want
        assert len(s) == len(model)
        assert sorted(int(k) for k in s.keys_array()) == sorted(model)

    check()


def test_seenset_state_roundtrip_preserves_spill_config(tmp_path):
    """Checkpoint resume must keep the exact store's spill/memory config
    (review finding: from_state used to rebuild with RAM defaults)."""
    spill = str(tmp_path / "sp")
    s = SeenSet(capacity=1 << 8, exact_max_inmem=32, exact_spill_dir=spill)
    keys = np.arange(1, 500, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    s.check_and_add(keys)
    s2 = SeenSet.from_state(s.state())
    assert s2._exact.spill_dir == spill
    assert s2._exact.max_inmem == 32
    assert s2.contains_many(keys).all()
    assert len(s2) == len(s)
    import os

    assert os.listdir(spill), "restored store did not spill to disk"


def test_cuckoo_add_many_crossed_bucket_twins_idempotent():
    """Two keys sharing a fingerprint whose home/alt buckets are SWAPPED
    (alt() is an involution) are membership-identical; the vectorized
    add_many must insert exactly one, matching sequential insertion, and
    a delete of either key must clear both (regression: batch dedup once
    keyed on home bucket only, inserting the fingerprint twice)."""
    from fscrawler_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(capacity=1500)
    assert cf.n_buckets == 512
    keys = np.array([86274, 130294], dtype=np.uint64)
    fps = cf._fp(keys)
    i1 = cf._i1(keys)
    i2 = cf._alt(i1, fps)
    # fixture really is the crossed-twin case
    assert fps[0] == fps[1] and i1[0] == i2[1] and i1[1] == i2[0]

    assert cf.add_many(keys) == 1
    assert cf.count == 1
    seq = CuckooFilter(capacity=1500)
    assert sum(seq.add_many(keys[i : i + 1]) for i in range(2)) == 1
    # idempotent re-add, and one delete clears both twins
    assert cf.add_many(keys) == 0
    assert cf.delete_many(keys[:1]) == 1
    assert not cf.contains_many(keys).any()
    assert cf.count == 0
