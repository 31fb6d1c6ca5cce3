"""Fuzzy similarity join: near-miss name pairs by edit distance.

The family's fourth verify kernel (exact-Jaccard, hamming/simhash,
cosine — now Levenshtein).  Candidates co-partition by a blocking key in
ONE shuffle; inside each block a length band (|Δlen| ≤ max_dist is a
NECESSARY condition for lev ≤ max_dist) prunes the quadratic pair set
before the vectorized DP (functions/editdist.levenshtein_pairs) runs.

Scale posture: the block key bounds the quadratic term.  The default
block is COMPOSITE — (key, len(name)//B) with each row replicated into
its home bucket and the next one up ("ghost" copy).  |Δlen| ≤ max_dist
is necessary for lev ≤ max_dist, and with B ≥ max_dist such a pair spans
at most ADJACENT buckets, so home+ghost replication covers every
qualifying pair; a pair is emitted only where at least one side is a
home copy, so each pair surfaces in exactly one bucket (both-home in the
shared bucket, split-home in the upper one, both-ghost filtered).  One
hot key therefore shards into O(name-length/B) groups instead of one
quadratic reducer — the same banding discipline as the MinHash pipeline.
Extends the reference's exact duplicate-finder (app/data_manager.py) to
near-miss names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.editdist import levenshtein_pairs

_BUCKET = "_len_bucket"
_HOME = "_is_home"


def similar_name_pairs(
    ds,
    key: str,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
    out_a: str = "id_a",
    out_b: str = "id_b",
    len_bucket: int | None = 8,
):
    """All (id_a < id_b) pairs within each `key` block whose `name_col`
    edit distance is ≤ max_dist.  Returns a Dataset with columns
    (key, out_a, out_b, dist).

    ``len_bucket`` widens the block key to (key, length-bucket) with
    ±1-bucket ghost replication (see module docstring) so one hot key
    cannot funnel into a single quadratic ``map_groups`` task; pass
    ``None`` to block on ``key`` alone (test/equivalence baseline)."""
    banded = len_bucket is not None
    if banded:
        width = max(int(len_bucket), max_dist, 1)

        def explode(b: pa.Table) -> pa.Table:
            lens = pc.utf8_length(pc.fill_null(b.column(name_col), "")).cast(pa.int64())
            h = pc.divide(lens, width)
            home = b.append_column(_BUCKET, h).append_column(
                _HOME, pa.array(np.ones(b.num_rows, dtype=bool))
            )
            ghost = b.append_column(_BUCKET, pc.add(h, 1)).append_column(
                _HOME, pa.array(np.zeros(b.num_rows, dtype=bool))
            )
            return pa.concat_tables([home, ghost])

        ds = ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=g[key].dtype),
                out_a: pd.Series([], dtype=np.int64),
                out_b: pd.Series([], dtype=np.int64),
                "dist": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy(dtype=np.int64)
        names = g[name_col].to_numpy(dtype=object)
        ii, jj = np.triu_indices(len(g), k=1)
        if banded:
            hm = g[_HOME].to_numpy(dtype=bool)
            keep = hm[ii] | hm[jj]  # both-ghost pairs belong to the bucket below
            ii, jj = ii[keep], jj[keep]
        lens = np.array([len(x or "") for x in names], dtype=np.int64)
        band = np.abs(lens[ii] - lens[jj]) <= max_dist
        ii, jj = ii[band], jj[band]
        if len(ii) == 0:
            return empty
        d = levenshtein_pairs(names[ii], names[jj])
        m = d <= max_dist
        return pd.DataFrame(
            {
                key: np.repeat(g[key].iat[0], int(m.sum())),
                out_a: ids[ii[m]],
                out_b: ids[jj[m]],
                "dist": d[m],
            }
        )

    group_keys = [key, _BUCKET] if banded else key
    return ds.groupby(group_keys).map_groups(pairs, batch_format="pandas")


def q_similar_part_names(sf_dir: str, max_dist: int = 2):
    """Within-brand part-name near-miss pairs (fuzzy duplicate catalog
    entries)."""
    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_name"])
    return similar_name_pairs(
        ds, key="p_brand", id_col="p_partkey", name_col="p_name",
        max_dist=max_dist, out_a="partkey_a", out_b="partkey_b",
    )


def q_name_triangles(sf_dir: str, max_dist: int = 2):
    """Triangles in the within-brand name-similarity graph — cliques of
    mutually near-miss catalog names (the fuzzy-dup cluster signal one
    step above pairs).  Edges come from the fuzzy join; enumeration is
    graph.triangles' distributed wedge-check."""
    import pyarrow as pa

    from .graph import triangles

    pairs = q_similar_part_names(sf_dir, max_dist=max_dist)
    # the fuzzy join emits every (a < b) pair exactly once -> skip the
    # pair-dedup shuffle inside triangles
    out = triangles(pairs, a_col="partkey_a", b_col="partkey_b", assume_unique=True)
    # collect (output-sized) with a TYPED empty fallback: a 0-row Dataset
    # loses its schema through to_pandas, failing the dtype-strict check
    batches = [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not batches:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
    return pa.concat_tables(batches)


def q_part_entities(sf_dir: str):
    """Entity resolution, composed end-to-end: fuzzy blocking+verify
    (similar_name_pairs) → distributed connected components → canonical
    id = min partkey per component.  The full resolve — blocking, edit-
    distance verify, transitive closure — is SQL-checked (levenshtein
    edge set + recursive-CTE reachability), the same contract as
    corpus dedup's keeper-is-min-id."""
    from .graph import connected_components

    pairs = q_similar_part_names(sf_dir)
    out = connected_components(pairs, a_col="partkey_a", b_col="partkey_b")
    return out.rename_columns(["partkey", "canonical"])


KCORE_K = 3
KCORE_ROUNDS = 12


def q_name_kcore(sf_dir: str, k: int = KCORE_K):
    """k-core of the within-brand name-similarity graph — the densest
    fuzzy-duplicate clusters (every member near-misses ≥ k others even
    after all looser names are peeled away; the density signal one step
    above triangles).  Runs graph.kcore's distributed peel a FIXED
    KCORE_ROUNDS rounds so the DuckDB oracle replays the identical
    unrolled filter+degree rounds over the levenshtein edge set — extra
    rounds past the fixpoint are no-ops, so parity holds."""
    from .graph import kcore

    pairs = q_similar_part_names(sf_dir)
    out = kcore(pairs, k=k, a_col="partkey_a", b_col="partkey_b", rounds=KCORE_ROUNDS)
    return out.rename_columns(["partkey", "deg"])


def _name_kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    parts = [
        "WITH e0 AS MATERIALIZED (SELECT CAST(a.p_partkey AS BIGINT) AS x, CAST(b.p_partkey AS BIGINT) AS y "
        "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey "
        "WHERE levenshtein(a.p_name, b.p_name) <= 2), "
        "e AS MATERIALIZED (SELECT x AS s, y AS t FROM e0 UNION ALL SELECT y, x FROM e0), "
        "d1 AS MATERIALIZED (SELECT s, count(*) AS deg FROM e GROUP BY s), "
        f"l1 AS MATERIALIZED (SELECT s FROM d1 WHERE deg >= {k}), "
    ]
    for r in range(2, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT e.s, count(*) AS deg FROM e "
            f"JOIN l{r - 1} lx ON e.s = lx.s JOIN l{r - 1} ly ON e.t = ly.s GROUP BY e.s), "
            f"l{r} AS MATERIALIZED (SELECT s FROM d{r} WHERE deg >= {k}), "
        )
    parts.append(
        f"SELECT s AS partkey, CAST(deg AS BIGINT) AS deg FROM d{rounds} WHERE deg >= {k}"
    )
    return "".join(parts[:-1]).rstrip(", ") + " " + parts[-1]


ORACLE_SQL = {
    "part_entities": (
        "WITH RECURSIVE e0 AS (SELECT CAST(a.p_partkey AS BIGINT) AS x, CAST(b.p_partkey AS BIGINT) AS y "
        "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey "
        "WHERE levenshtein(a.p_name, b.p_name) <= 2), "
        "e AS (SELECT x AS a, y AS b FROM e0 UNION SELECT y, x FROM e0), "
        "reach(a, b) AS ((SELECT a, a FROM e UNION SELECT a, b FROM e) "
        "UNION SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b) "
        "SELECT a AS partkey, min(b) AS canonical FROM reach GROUP BY a"
    ),
    "name_kcore": _name_kcore_sql(),
    "name_triangles": (
        "WITH e AS (SELECT CAST(a.p_partkey AS BIGINT) AS x, CAST(b.p_partkey AS BIGINT) AS y "
        "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey "
        "WHERE levenshtein(a.p_name, b.p_name) <= 2) "
        "SELECT e1.x AS a, e1.y AS b, e2.y AS c "
        "FROM e e1 JOIN e e2 ON e2.x = e1.y JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y"
    ),
    "similar_part_names": (
        "SELECT a.p_brand, CAST(a.p_partkey AS BIGINT) AS partkey_a, "
        "CAST(b.p_partkey AS BIGINT) AS partkey_b, CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist "
        "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey "
        "WHERE levenshtein(a.p_name, b.p_name) <= 2"
    )
}
