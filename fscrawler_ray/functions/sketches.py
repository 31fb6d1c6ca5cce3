"""Mergeable sketches for wide aggregations — HyperLogLog distinct counts.

The 100-TB shape for COUNT(DISTINCT x): never shuffle raw values. Each
``map_batches`` task folds its batch into a fixed 2^p-byte register array
(a *mergeable* partial — the combiner rule for wide steps); registers
merge by element-wise max, so the reduction tree is associative,
commutative and idempotent (safe under Ray task retries). The driver ever
sees only #blocks × 2^p bytes of registers, not the value universe.

Estimator: the standard bias-corrected HLL of Flajolet et al. 2007 with
the small-range linear-counting correction — published-algorithm ground
only. Register-index/rank split follows the paper: first ``p`` hash bits
pick the register, the rank is 1 + leading-zeros of the remaining 64-p
bits. Accuracy σ ≈ 1.04/√(2^p): p=12 → ~1.6%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import xxh64_batch


def hll_fold(values: pa.Array | pa.ChunkedArray, p: int = 12, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold a column into HLL registers (uint8[2^p]); pass ``registers``
    to accumulate in place across batches."""
    m = 1 << p
    if registers is None:
        registers = np.zeros(m, dtype=np.uint8)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    # COUNT(DISTINCT x) semantics: NULL is not a value — drop it (also
    # keeps NULL from colliding with the empty string in the hash).
    values = values.drop_null()
    if len(values) == 0:
        return registers
    h = xxh64_batch(values.cast(pa.string()), seed=77)
    return _regs_update(h, p, registers)


def _regs_update(h: np.ndarray, p: int, registers: np.ndarray) -> np.ndarray:
    """Register-update kernel shared by every HLL fold: first ``p`` hash
    bits pick the register; rank = 1 + leading-zeros of the remaining
    left-aligned 64-p bits, capped at 64-p+1."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # low 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0)
    nz = rest != 0
    # bit_length via log2 is unsafe for 64-bit ints; use a float-free loop
    # over the 6 shift levels (branch-free vectorized clz)
    clz = np.full(len(h), 64, dtype=np.int64)
    x = rest.copy()
    n = np.zeros(len(h), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = nz & (x >> np.uint64(64 - shift) == 0)
        n[mask] += shift
        x[mask] = x[mask] << np.uint64(shift)
    clz[nz] = n[nz]
    rank = np.minimum(clz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def md5_u64_batch(values: pa.Array) -> np.ndarray:
    """Little-endian first 8 bytes of md5(utf8(value)) → uint64 — exactly
    DuckDB's ``md5_number_upper(CAST(x AS VARCHAR))``, verified bitwise
    against duckdb 1.0. Per-value hashlib loop (md5 has no vectorized
    kernel here) amortized by hashing UNIQUE values once per batch; this
    hash exists so a sketch can be replayed by the SQL oracle — the scale
    path stays on the vectorized xxh64 fold."""
    import hashlib

    vals = pa.compute.unique(values)
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "little") for v in vals.to_pylist()),
        dtype=np.uint64,
        count=len(vals),
    )
    pos = pa.compute.index_in(values, value_set=vals).to_numpy(zero_copy_only=False)
    return uh[pos.astype(np.int64)]


def md5_chunks_batch(values: pa.Array, depth: int) -> np.ndarray:
    """``depth`` independent uint64 hashes per value from ONE md5 pass:
    chunk d = int(hexdigest[8d:8d+8], 16) — exactly DuckDB's
    ``CAST('0x' || substring(md5(x), 1+8*d, 8) AS UBIGINT)``.  depth ≤ 4
    (md5 hexdigest has 32 chars).  Unique-amortized like md5_u64_batch;
    exists so the CMS oracle can replay the grid — the scale path stays on
    the vectorized xxh64 fold."""
    import hashlib

    assert depth <= 4
    vals = pa.compute.unique(values)
    vl = vals.to_pylist()
    uh = np.empty((depth, len(vl)), dtype=np.uint64)
    for i, v in enumerate(vl):
        hx = hashlib.md5(v.encode()).hexdigest()
        for d in range(depth):
            uh[d, i] = int(hx[8 * d : 8 * d + 8], 16)
    pos = pa.compute.index_in(values, value_set=vals).to_numpy(zero_copy_only=False).astype(np.int64)
    return uh[:, pos]


def cms_fold_md5(
    values: pa.Array | pa.ChunkedArray, width: int = 4096, depth: int = 4, registers: np.ndarray | None = None
) -> np.ndarray:
    """``cms_fold`` with the SQL-replayable md5-chunk row hashes; same
    grid shape, same add-merge."""
    if registers is None:
        registers = np.zeros((depth, width), dtype=np.int64)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()
    if len(values) == 0:
        return registers
    ch = md5_chunks_batch(values.cast(pa.string()), depth)
    for d in range(depth):
        np.add.at(registers[d], (ch[d] % np.uint64(width)).astype(np.int64), 1)
    return registers


def cms_query_md5(registers: np.ndarray, items: pa.Array) -> np.ndarray:
    """Estimated counts from an md5-chunk grid (min over rows)."""
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    s = items.cast(pa.string())
    depth, width = registers.shape
    ch = md5_chunks_batch(s, depth)
    est = np.full(len(s), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        est = np.minimum(est, registers[d, (ch[d] % np.uint64(width)).astype(np.int64)])
    return est


def hll_fold_md5(values: pa.Array | pa.ChunkedArray, p: int = 12, registers: np.ndarray | None = None) -> np.ndarray:
    """``hll_fold`` with the SQL-replayable md5 register hash (see
    ``md5_u64_batch``); same register/rank split, same merge."""
    m = 1 << p
    if registers is None:
        registers = np.zeros(m, dtype=np.uint8)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()
    if len(values) == 0:
        return registers
    return _regs_update(md5_u64_batch(values.cast(pa.string())), p, registers)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise max — associative/commutative/idempotent."""
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected cardinality estimate (Flajolet et al. 2007 §4)."""
    m = len(registers)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.sum(registers == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_estimate_sql_exact(registers: np.ndarray, p: int) -> float:
    """``hll_estimate`` rewritten so a DuckDB oracle reproduces it
    BIT-IDENTICALLY: the 2^-rank sum is folded in exact integer
    arithmetic (sum of 2^(cap-r), a Python int ≤ 2^(64+1)), the alpha
    constant is the same literal expression both sides, every float op is
    a power-of-two scaling or a single division, and the linear-counting
    log goes through libm (``math.log`` here ≡ DuckDB ``ln``, verified
    bitwise on this platform). See ORACLE_SQL['approx_distinct_users_by_type']."""
    import math

    m = 1 << p
    cap = 64 - p + 1
    counts = np.bincount(registers, minlength=cap + 1)
    s_int = sum(int(c) << (cap - r) for r, c in enumerate(counts.tolist()) if c)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m * float(1 << cap) / float(s_int)
    zeros = int(counts[0])
    if raw <= 2.5 * m and zeros > 0:
        return float(m) * math.log(float(m) / zeros)
    return raw


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset: per-block register
    folds (2^p bytes each) stream to the driver for the final max-merge —
    the shuffle-free mergeable-sketch reduction."""

    def fold(b: pa.Table) -> pa.Table:
        regs = hll_fold(b.column(col), p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(fold, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for buf in b.column("regs").to_pylist():
            merged = hll_merge(merged, np.frombuffer(buf, dtype=np.uint8))
    return hll_estimate(merged)


def _grouped_slices(b: pa.Table, key: str):
    """Yield (key_value, contiguous_slice) per key group after ONE sort
    pass — O(N log N) per batch, not O(K·N) filter scans; a NULL key is
    its own group (SQL GROUP BY keeps the NULL group). Shared by every
    grouped sketch below."""
    order = pa.compute.sort_indices(b.column(key))
    sorted_t = b.take(order)
    karr = sorted_t.column(key).combine_chunks()
    if not len(karr):
        return
    code = pa.compute.fill_null(karr.dictionary_encode().indices, -1).to_numpy(
        zero_copy_only=False
    )
    starts = np.flatnonzero(np.r_[True, code[1:] != code[:-1]])
    bounds = np.r_[starts[1:], len(code)]
    for s, e in zip(starts.tolist(), bounds.tolist()):
        yield karr[s].as_py(), sorted_t.slice(s, e - s)


def _fold_by_key(ds, key: str, fold_slice, merge, dtype) -> dict:
    """Generic grouped-sketch reduction: per-(block, key) partials from
    ``fold_slice(slice) -> np.ndarray``, driver ``merge`` per key.
    Driver state = #keys × one register array — never raw values."""

    def fold(b: pa.Table) -> pa.Table:
        keys, regs = [], []
        for k, sl in _grouped_slices(b, key):
            keys.append(k)
            regs.append(fold_slice(sl).tobytes())
        return pa.table(
            {key: pa.array(keys, b.schema.field(key).type), "regs": pa.array(regs, pa.binary())}
        )

    acc: dict = {}
    for b in ds.map_batches(fold, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for k, buf in zip(b.column(key).to_pylist(), b.column("regs").to_pylist()):
            r = np.frombuffer(buf, dtype=dtype)
            acc[k] = merge(acc[k], r) if k in acc else r
    return acc


def hll_distinct_by_key(ds, key: str, col: str, p: int = 12) -> pa.Table:
    """Per-key approximate distinct counts: per-(block, key) register
    partials, driver max-merge per key — #keys × 2^p bytes of state, the
    grouped version of the same shuffle-free reduction. For large key
    cardinality, swap the driver merge for a groupby over the partial
    rows; keys here are small-cardinality dimensions."""
    acc = _fold_by_key(ds, key, lambda sl: hll_fold(sl.column(col), p=p), hll_merge, np.uint8)
    ks = sorted(acc, key=lambda k: (k is None, k))
    return pa.table(
        {
            key: pa.array(ks),
            "approx_distinct": pa.array([int(round(hll_estimate(acc[k]))) for k in ks], pa.int64()),
        }
    )


def hll_distinct_by_key_md5(ds, key: str, col: str, p: int = 12) -> pa.Table:
    """``hll_distinct_by_key`` on the SQL-replayable md5 register hash with
    the bit-exact estimator — the variant the driver's DuckDB oracle can
    replay register-for-register (registers, ranks, integer 2^-rank sum,
    libm linear-counting log, half-up final rounding all match). Same
    shuffle-free mergeable-partial shape as the xxh64 path."""
    import math

    acc = _fold_by_key(ds, key, lambda sl: hll_fold_md5(sl.column(col), p=p), hll_merge, np.uint8)
    ks = sorted(acc, key=lambda k: (k is None, k))
    ests = [hll_estimate_sql_exact(acc[k], p) for k in ks]
    return pa.table(
        {
            key: pa.array(ks),
            # floor(x + 0.5): explicit half-up — round() would banker-round
            "approx_distinct": pa.array([int(math.floor(e + 0.5)) for e in ests], pa.int64()),
        }
    )


# --- Count-Min sketch: approximate frequencies / heavy hitters ---
#
# Same mergeable-partial discipline as HLL, for COUNT(*) GROUP BY over a
# huge key universe (vocabulary stats, hot-host detection): each block
# folds into a depth x width int64 grid; grids merge by addition
# (associative + commutative; NOT idempotent, which is safe here because
# partials are merged from the exactly-once output block stream, not
# re-folded on task retry — Ray retries re-run the producer task, they
# never double-deliver its block).  Estimate = min over rows (Cormode &
# Muthukrishnan 2005): always >= true count, overshoot bounded by
# eps = e/width of the total mass per row.


def cms_fold(values: pa.Array | pa.ChunkedArray, width: int = 4096, depth: int = 4, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold a value column into a Count-Min grid (int64[depth, width])."""
    if registers is None:
        registers = np.zeros((depth, width), dtype=np.int64)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()
    if len(values) == 0:
        return registers
    s = values.cast(pa.string())
    for d in range(depth):
        idx = (xxh64_batch(s, seed=9000 + d) % np.uint64(width)).astype(np.int64)
        np.add.at(registers[d], idx, 1)
    return registers


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(registers: np.ndarray, items: pa.Array) -> np.ndarray:
    """Estimated counts for ``items`` (int64, upward-biased)."""
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    s = items.cast(pa.string())
    depth, width = registers.shape
    est = np.full(len(s), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = (xxh64_batch(s, seed=9000 + d) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, registers[d, idx])
    return est


def heavy_hitters(ds, col: str, k: int = 20, width: int = 4096, depth: int = 4, candidates_per_block: int = 64) -> pa.Table:
    """Approximate top-k frequent values: each block contributes its CMS
    partial AND its local exact top-``candidates_per_block`` values (any
    global heavy hitter is a local heavy hitter in at least one block for
    skew-free hashing — the standard candidate-union trick); the driver
    add-merges the grids, unions the candidates, and ranks candidates by
    CMS estimate.  Driver state: depth*width ints + the candidate set —
    never the value universe."""
    import pyarrow.compute as pc

    def fold(b: pa.Table) -> pa.Table:
        vals = b.column(col)
        regs = cms_fold(vals, width=width, depth=depth)
        vc = pc.value_counts(vals.combine_chunks().drop_null().cast(pa.string()))
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        top = np.argsort(-counts, kind="stable")[:candidates_per_block]
        cand = pc.take(vc.field("values"), pa.array(top, pa.int64()))
        return pa.table(
            {
                "regs": pa.array([regs.tobytes()], pa.binary()),
                "cands": pa.array([cand.to_pylist()], pa.list_(pa.string())),
            }
        )

    merged = np.zeros((depth, width), dtype=np.int64)
    cands: set = set()
    for b in ds.map_batches(fold, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for buf, cl in zip(b.column("regs").to_pylist(), b.column("cands").to_pylist()):
            merged = cms_merge(merged, np.frombuffer(buf, dtype=np.int64).reshape(depth, width))
            cands.update(cl)
    if not cands:
        return pa.table({col: pa.array([], pa.string()), "approx_count": pa.array([], pa.int64())})
    carr = pa.array(sorted(cands), pa.string())
    est = cms_query(merged, carr)
    top = np.lexsort((np.arange(len(est)), -est))[:k]  # count desc, value asc on ties
    return pa.table(
        {
            col: pa.compute.take(carr, pa.array(top, pa.int64())),
            "approx_count": pa.array(est[top], pa.int64()),
        }
    )


# --- Quantile histogram sketch: approximate quantiles for bounded ranges ---
#
# A fixed-range equi-width histogram is the simplest mergeable quantile
# partial (add-merge grids, like CMS): rank error is zero (the histogram
# holds exact bin counts), value error is bounded by one bin width
# (hi-lo)/bins.  Right for columns with a known domain (lengths, sizes,
# scores); unbounded domains should log-transform first.


def qhist_fold(values: np.ndarray | pa.Array, lo: float, hi: float, bins: int = 4096, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold numeric values into int64[bins] counts; values are clipped
    into [lo, hi] (clipped mass lands in the edge bins)."""
    if registers is None:
        registers = np.zeros(bins, dtype=np.int64)
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        values = values.drop_null().to_numpy(zero_copy_only=False)
    if len(values) == 0:
        return registers
    x = np.clip(values.astype(np.float64), lo, hi)
    idx = np.minimum(((x - lo) * (bins / (hi - lo))).astype(np.int64), bins - 1)
    np.add.at(registers, idx, 1)
    return registers


def qhist_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def qhist_quantile(registers: np.ndarray, q: float, lo: float, hi: float) -> float:
    """Upper edge of the bin holding the q-quantile (discrete-quantile
    convention: the sorted[(n-1)*q]-th value's bin)."""
    n = int(registers.sum())
    if n == 0:
        return float("nan")
    target = int(np.floor(q * (n - 1)))
    cum = np.cumsum(registers)
    b = int(np.searchsorted(cum, target + 1))
    bins = len(registers)
    return lo + (b + 1) * (hi - lo) / bins


def approx_quantile_by_key(ds, key: str, col: str, q: float, lo: float, hi: float, bins: int = 4096) -> pa.Table:
    """Grouped approximate quantile: per-(block, key) histogram partials,
    driver add-merge per key — #keys x bins ints of driver state."""
    acc = _fold_by_key(
        ds, key, lambda sl: qhist_fold(sl.column(col), lo, hi, bins), qhist_merge, np.int64
    )
    ks = sorted(acc, key=lambda x: (x is None, x))
    return pa.table(
        {
            key: pa.array(ks),
            "approx_quantile": pa.array(
                [qhist_quantile(acc[kk], q, lo, hi) for kk in ks], pa.float64()
            ),
        }
    )
