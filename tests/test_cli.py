"""CLI smoke tests (subprocess: each command owns its Ray session)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "filda_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )


def test_list_queries():
    r = _run("list-queries")
    assert r.returncode == 0
    assert "flagship_detect" in r.stdout and "sql-oracled" in r.stdout


def test_detect_and_query(tmp_path):
    out = str(tmp_path / "det")
    r = _run("--num-cpus", "4", "detect", "--sf-dir", "/root/testdata/sf0.001",
             "--out", out)
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 500 and res["partitions"] > 0
    r2 = _run("--num-cpus", "4", "query", "tile_counts",
              "--sf-dir", "/root/testdata/sf0.001")
    assert r2.returncode == 0, r2.stderr[-500:]
    assert "rows" in r2.stdout


def test_unknown_query_is_clean_error():
    r = _run("--num-cpus", "2", "query", "nope")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_detect_with_config(tmp_path):
    cfgf = tmp_path / "run.nml"
    cfgf.write_text("Ring ladder : 1 2\nZ high : 5.0\nOutput version : cli_cfg\n")
    out = str(tmp_path / "det")
    r = _run("--num-cpus", "4", "detect", "--sf-dir", "/root/testdata/sf0.001",
             "--out", out, "--config", str(cfgf))
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 500
    import glob

    marker = sorted(glob.glob(os.path.join(out, "part=*", "_SUCCESS.json")))[0]
    with open(marker) as f:
        rec = json.load(f)
    assert rec["lineage"]["config"]["output_version"] == "cli_cfg"
