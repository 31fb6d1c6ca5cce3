"""Additional analytics-family checks (round 5)."""


def test_psi_drift_detects_planted_shift(tmp_path, ray_session):
    """A deliberate mean shift between the two halves produces a large
    total PSI; identical halves produce ~zero."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.analytics import q_psi_drift

    rng = np.random.default_rng(3)
    n = 4000
    ts = pa.array(
        (np.arange(n) * 1_000_000).astype("datetime64[us]"), pa.timestamp("us")
    )
    drifted = np.concatenate([rng.normal(10, 1, n // 2), rng.normal(20, 1, n // 2)])
    d = str(tmp_path / "drift")
    import os

    os.makedirs(d)
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(drifted, pa.float64())}),
        os.path.join(d, "events.parquet"),
    )
    psi = q_psi_drift(d).column("psi_micro").to_pandas().sum() / 1e6
    assert psi > 0.5  # classic alarm threshold is 0.2

    flat = rng.normal(10, 1, n)
    f = str(tmp_path / "flat")
    os.makedirs(f)
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(flat, pa.float64())}),
        os.path.join(f, "events.parquet"),
    )
    psi_flat = q_psi_drift(f).column("psi_micro").to_pandas().sum() / 1e6
    assert psi_flat < 0.05
