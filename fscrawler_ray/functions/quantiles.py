"""Distributed EXACT discrete quantiles without materializing any group.

``grouped_quantile_disc`` computes DuckDB's ``quantile_disc(col, q)`` per
group — the element at 1-based rank ``ceil(q*n)`` of the sorted non-null
values, with q handled as an exact rational so the index convention
matches DuckDB bit-for-bit — using histogram narrowing instead of a
per-group sort:

  pass 1   per-group count / min / max      (per-block partials → tiny groupby)
  pass 2+  per-(group, bin) counts over a linear binning of the group's
           current [lo, hi] range; locate the bin holding the target rank,
           subtract the mass below it, and shrink the range (repeat while
           a bin still holds too many rows)
  final    collect ONLY the rows in each group's target bin
           (≈ n / n_bins^levels per group) and select exactly.

This replaces the map_groups-sort pattern (which pins an entire group's
values in one task — a memory cap at 100 TB) with streaming passes whose
shuffle volume is per-block partials and whose driver state is
n_groups × a few scalars plus the final candidate rows (asserted below
``collect_limit``).  Reference analog: the percentile reporting of
app/sql/stats.sql — recomputed here as a scale-safe custom operator
(SURVEY §2.4 A5 family).

The binning function is weakly monotone in the value (floor of an IEEE
division by a positive width), so "mass below the target bin" is exact;
exactness of the answer never depends on float edge placement because the
final step sorts the actual candidate values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum


def _rank_of(q_num: int, q_den: int, n: int) -> int:
    """DuckDB quantile_disc rank: ceil(q*n) in exact rational arithmetic,
    clamped to [1, n]."""
    return min(max((q_num * n + q_den - 1) // q_den, 1), n)


def _bin_of(v: np.ndarray, lo: float, width: float, n_bins: int) -> np.ndarray:
    """Monotone bin assignment; values at/above the top edge clip into the
    last bin (the binning only narrows — selection stays exact)."""
    if width <= 0.0:
        return np.zeros(len(v), dtype=np.int64)
    b = np.floor((v - lo) / width).astype(np.int64)
    return np.clip(b, 0, n_bins - 1)


def _filter_constraints(keys: np.ndarray, vals: np.ndarray, constraints: dict):
    """Keep rows whose (key, value) satisfies every previous level's
    target-bin assignment. ``constraints[k]`` is a list of
    (lo, width, n_bins, target_bin) tuples, finest last."""
    mask = np.zeros(len(vals), dtype=bool)
    for k, levels in constraints.items():
        km = keys == k
        if not km.any():
            continue
        sel = km
        for lo, width, n_bins, tb in levels:
            sel = sel & (_bin_of(vals, lo, width, n_bins) == tb)
        mask |= sel
    return mask


def grouped_quantile_disc(
    ds,
    key: str,
    col: str,
    q_num: int,
    q_den: int,
    *,
    n_bins: int = 1024,
    max_levels: int = 3,
    collect_limit: int = 200_000,
    out: str = "q_value",
    rank_fn=None,
    with_n: bool = False,
    rank2_fn=None,
    out2: str = "q_value2",
):
    """Exact per-group discrete quantile → pyarrow Table (key, out).

    Groups whose ``col`` is entirely null are dropped (SQL aggregate
    semantics would surface them as NULL; callers that need them can left
    join the key table back).  Raises if the final candidate set exceeds
    ``collect_limit`` — at that point raise ``max_levels`` (each level
    divides the candidate count by ``n_bins``).

    ``rank_fn(n) -> 1-based rank`` overrides the quantile_disc rank
    convention; ``with_n`` appends the group's non-null count as column
    "n".  ``rank2_fn`` tracks a SECOND rank (must be ≥ rank and within
    the same group) through the SAME narrowing passes — when the two
    ranks split across bins, rank sits at its bin's top (value = the
    bin's tracked vmax) and rank2 at the next bin's bottom (vmin), so
    both resolve for free from the per-bin min/max the histogram already
    carries.  This is how ``grouped_quantile_cont`` gets both order
    statistics in one run instead of two."""
    if not (0 < q_num <= q_den):
        raise ValueError(f"q must be in (0, 1]: {q_num}/{q_den}")

    def drop_null(b: pa.Table) -> pa.Table:
        return b.select([key, col]).filter(pc.is_valid(b.column(col)))

    slim = ds.map_batches(drop_null, batch_format="pyarrow")

    # ---- pass 1: per-group count / min / max (partials, then tiny groupby)
    def p1(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, [key]).aggregate([(col, "count"), (col, "min"), (col, "max")])
        return pa.table(
            {
                key: g.column(key),
                "n_p": g.column(f"{col}_count").cast(pa.int64()),
                "lo_p": g.column(f"{col}_min").cast(pa.float64()),
                "hi_p": g.column(f"{col}_max").cast(pa.float64()),
            }
        )

    stats = (
        slim.map_batches(p1, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n_p"), Min("lo_p"), Max("hi_p"))
        .to_pandas()
    )
    if len(stats) == 0:
        # preserve the caller's key dtype on the empty path (an int64-keyed
        # caller must not get a string column back)
        try:
            key_type = ds.schema().base_schema.field(key).type
        except Exception:
            key_type = pa.string()
        cols = {key: pa.array([], key_type), out: pa.array([], pa.float64())}
        if rank2_fn is not None:
            cols[out2] = pa.array([], pa.float64())
        if with_n:
            cols["n"] = pa.array([], pa.int64())
        return pa.table(cols)

    # per-key narrowing state: remaining 1-based rank within the current
    # range, plus the constraint stack defining that range
    state: dict = {}
    for _, r in stats.iterrows():
        n = int(r["sum(n_p)"])
        rank = rank_fn(n) if rank_fn is not None else _rank_of(q_num, q_den, n)
        rank2 = rank2_fn(n) if rank2_fn is not None else None
        if rank2 is not None and not (rank <= rank2 <= rank + 1):
            # the boundary-straddle resolution below is only valid for an
            # ADJACENT pair (it infers rank == its bin's last element);
            # distant second ranks need their own narrowing run
            raise ValueError(f"rank2 ({rank2}) must be rank or rank+1 (rank={rank})")
        state[r[key]] = {
            "rank": rank,
            "rank2": rank2,
            "n0": n,
            "n": n,
            "lo": float(r["min(lo_p)"]),
            "hi": float(r["max(hi_p)"]),
            "levels": [],
            "done": None,
            "done2": None,
        }

    # ---- passes 2..k: histogram narrowing
    for _level in range(max_levels):
        active = {k: s for k, s in state.items() if s["done"] is None and s["n"] > collect_limit}
        if not active:
            break
        # snapshot: key -> (constraint stack, new binning params)
        plan = {}
        for k, s in active.items():
            width = (s["hi"] - s["lo"]) / n_bins
            if width <= 0.0:  # range cannot shrink: all remaining values equal
                s["done"] = s["done2"] = s["lo"]
                continue
            plan[k] = (tuple(s["levels"]), s["lo"], width)
        if not plan:
            break

        def hist(b: pa.Table, plan=plan) -> pa.Table:
            keys = b.column(key).to_numpy(zero_copy_only=False)
            vals = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            out_k, out_b, out_c, out_lo, out_hi = [], [], [], [], []
            for k, (levels, lo, width) in plan.items():
                sel = keys == k
                for plo, pw, pn, tb in levels:
                    sel = sel & (_bin_of(vals, plo, pw, pn) == tb)
                v = vals[sel]
                if len(v) == 0:
                    continue
                bins = _bin_of(v, lo, width, n_bins)
                cnt = np.bincount(bins, minlength=n_bins)
                vmin = np.full(n_bins, np.inf)
                vmax = np.full(n_bins, -np.inf)
                np.minimum.at(vmin, bins, v)
                np.maximum.at(vmax, bins, v)
                nz = np.flatnonzero(cnt)
                out_k.extend([k] * len(nz))
                out_b.append(nz)
                out_c.append(cnt[nz])
                out_lo.append(vmin[nz])
                out_hi.append(vmax[nz])
            if not out_k:
                return pa.table(
                    {
                        key: pa.array([], b.column(key).type),
                        "bin": pa.array([], pa.int64()),
                        "cnt_p": pa.array([], pa.int64()),
                        "vmin_p": pa.array([], pa.float64()),
                        "vmax_p": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    key: pa.array(out_k, b.column(key).type),
                    "bin": np.concatenate(out_b).astype(np.int64),
                    "cnt_p": np.concatenate(out_c).astype(np.int64),
                    "vmin_p": np.concatenate(out_lo),
                    "vmax_p": np.concatenate(out_hi),
                }
            )

        counts = (
            slim.map_batches(hist, batch_format="pyarrow")
            .groupby([key, "bin"])
            .aggregate(Sum("cnt_p"), Min("vmin_p"), Max("vmax_p"))
            .to_pandas()
        )
        for k in plan:
            _, lo, width = plan[k]
            sub = counts[counts[key] == k].sort_values("bin")
            cum = sub["sum(cnt_p)"].cumsum().to_numpy()
            bins = sub["bin"].to_numpy()
            s = state[k]
            i = int(np.searchsorted(cum, s["rank"]))
            below = int(cum[i - 1]) if i > 0 else 0
            tb = int(bins[i])
            vmins = sub["min(vmin_p)"].to_numpy()
            vmaxs = sub["max(vmax_p)"].to_numpy()
            bin_lo = float(vmins[i])
            bin_hi = float(vmaxs[i])
            if s["rank2"] is not None:
                i2 = int(np.searchsorted(cum, s["rank2"]))
                if i2 != i:
                    # the ranks straddle a bin boundary: rank is its bin's
                    # LAST element (= tracked vmax), rank2 the next
                    # nonempty bin's FIRST (= vmin) — both resolve now
                    s["done"] = float(vmaxs[i])
                    s["done2"] = float(vmins[i2])
                    continue
                s["rank2"] -= below
            if bin_lo == bin_hi:  # the target bin holds ONE distinct value
                s["done"] = s["done2"] = bin_lo
                continue
            s["rank"] -= below
            s["n"] = int(cum[i]) - below
            s["levels"].append((lo, width, n_bins, tb))
            # tighten to the bin's ACTUAL value range, not its edges —
            # heavy duplicates converge immediately instead of looping
            s["lo"] = bin_lo
            s["hi"] = bin_hi

    # ---- final: collect candidates for unresolved keys, select exactly
    pending = {k: s for k, s in state.items() if s["done"] is None}
    if pending:
        total = sum(s["n"] for s in pending.values())
        if total > collect_limit * max(1, len(pending)):
            raise RuntimeError(
                f"quantile candidates ({total}) exceed collect_limit; raise max_levels"
            )
        constraints = {k: s["levels"] for k, s in pending.items()}

        def cand(b: pa.Table) -> pa.Table:
            keys = b.column(key).to_numpy(zero_copy_only=False)
            vals = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            m = _filter_constraints(keys, vals, constraints)
            return pa.table({key: pa.array(keys[m], b.column(key).type), "v": vals[m]})

        rows = slim.map_batches(cand, batch_format="pyarrow").to_pandas()
        for k, s in pending.items():
            v = np.sort(rows.loc[rows[key] == k, "v"].to_numpy())
            s["done"] = float(v[s["rank"] - 1])
            if s["rank2"] is not None:
                s["done2"] = float(v[s["rank2"] - 1])

    keys_sorted = list(state)
    cols = {
        key: pa.array(keys_sorted),
        out: pa.array([state[k]["done"] for k in keys_sorted], pa.float64()),
    }
    if rank2_fn is not None:
        cols[out2] = pa.array([state[k]["done2"] for k in keys_sorted], pa.float64())
    if with_n:
        cols["n"] = pa.array([state[k]["n0"] for k in keys_sorted], pa.int64())
    return pa.table(cols)


def grouped_quantile_cont(
    ds,
    key: str,
    col: str,
    q_num: int,
    q_den: int,
    *,
    n_bins: int = 1024,
    max_levels: int = 3,
    collect_limit: int = 200_000,
    out: str = "q_value",
):
    """Exact per-group INTERPOLATED quantile (DuckDB ``quantile_cont`` /
    ANSI percentile_cont): with idx = (n-1)·q held as an exact rational,
    the result is v[floor(idx)] + frac·(v[floor(idx)+1] − v[floor(idx)])
    over the 0-based sorted values.  Both order statistics ride ONE
    histogram-narrowing run (the adjacent-rank pair either narrows into
    the same bin or resolves instantly from the bin boundary's tracked
    vmax/vmin) — same streaming cost as a single quantile_disc, never a
    per-group sort.

    SQL parity note: DuckDB computes idx in FLOAT, so bit-exact oracle
    parity holds for dyadic q (1/2, 1/4, 3/4, …) where q·(n−1) is exact;
    the median is the headline case."""
    if not (0 < q_num <= q_den):
        raise ValueError(f"q must be in (0, 1]: {q_num}/{q_den}")

    def lo_rank(n: int) -> int:
        return min((n - 1) * q_num // q_den + 1, n)

    def hi_rank(n: int) -> int:
        return min((n - 1) * q_num // q_den + (2 if ((n - 1) * q_num) % q_den else 1), n)

    both = grouped_quantile_disc(
        ds, key, col, q_num, q_den, out="v_lo", out2="v_hi",
        rank_fn=lo_rank, rank2_fn=hi_rank, with_n=True,
        n_bins=n_bins, max_levels=max_levels, collect_limit=collect_limit,
    )
    vlo = both.column("v_lo").to_numpy(zero_copy_only=False)
    vhi = both.column("v_hi").to_numpy(zero_copy_only=False)
    n = both.column("n").to_numpy(zero_copy_only=False)
    frac = (((n - 1) * q_num) % q_den).astype(np.float64) / float(q_den)
    return pa.table({key: both.column(key), out: pa.array(vlo + frac * (vhi - vlo), pa.float64())})
