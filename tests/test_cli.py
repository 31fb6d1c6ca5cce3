import json
import os
import tempfile

from fscrawler_ray.__main__ import main


def test_cli_crawl_process_report(capsys):
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "out")
        proc = os.path.join(d, "proc")
        cfg = os.path.join(d, "crawl.yml")
        with open(cfg, "w") as f:
            f.write(
                f"""
seeds:
  - http://host00.example.com/
  - http://host01.example.com/
politeness_budget: 4
n_shards: 2
max_rounds: 16
out_dir: {out}
web: {{seed: 55, n_hosts: 3, max_depth: 3, fanout_dirs: 2, fanout_files: 4}}
"""
            )
        assert main(["crawl", cfg]) == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["result_rows"] > 0

        assert main(["process", out, proc]) == 0
        r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert r["processed"] == summary["result_rows"]

        assert main(["report", out]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["hosts"] and rep["formats"]

    assert main(["bogus"]) == 2
    assert main([]) == 0


def test_sql_job_cli(tmp_path):
    """jobs/sql_job.py: CSV to stdout, --explain prints the plan, --out
    writes parquet."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    sql = "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang"
    r = subprocess.run(
        [sys.executable, "jobs/sql_job.py", sql, "--sf", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0
    lines = [l for l in r.stdout.strip().splitlines() if "," in l]
    assert lines[0] == "lang,n" and len(lines) == 6

    r2 = subprocess.run(
        [sys.executable, "jobs/sql_job.py", sql, "--sf", "/root/testdata/sf0.001", "--explain"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r2.returncode == 0 and "partial-agg groupby" in r2.stdout

    out = str(tmp_path / "res.parquet")
    r3 = subprocess.run(
        [sys.executable, "jobs/sql_job.py", sql, "--sf", "/root/testdata/sf0.001", "--out", out],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r3.returncode == 0
    assert pq.read_table(out).num_rows == 5
