"""End-to-end CLI run: the `extract` subcommand in a real subprocess
(fresh Ray session, arg plumbing, CSV sink) must write byte-identical
output to the in-session pipeline — the reference's script surface,
driven the way a user drives it.
"""

import os
import subprocess
import sys

from spatial_aez_ray.pipelines import extract


def test_cli_extract_end_to_end(tiny_world, tmp_path):
    out = tmp_path / "cli_out"
    out.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "spatial_aez_ray", "--num-cpus", "2",
         "extract", "--world", tiny_world, "--out", str(out),
         "--datasets", "kg"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote 2 CSVs" in r.stdout

    got = (out / "Koppen-Geiger-by-country.csv").read_bytes()
    df = extract.zonal_stats(tiny_world, "kg")
    want_path = tmp_path / "want.csv"
    extract.write_csv(df, str(want_path))
    assert got == want_path.read_bytes()

    region = (out / "Koppen-Geiger-by-region.csv").read_bytes()
    assert region.startswith(b"Region,")


def test_cli_regions_and_proximity(tiny_world, tmp_path):
    import pandas as pd
    out = tmp_path / "cli_regions"
    r = subprocess.run(
        [sys.executable, "-m", "spatial_aez_ray", "--num-cpus", "2",
         "regions", "--world", tiny_world, "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    regions = pd.read_parquet(out / "regions.parquet")
    from spatial_aez_ray import fixtures, oracle
    assert regions.astype("int64").equals(
        oracle.regions_oracle(fixtures.TINY, "kg").astype("int64"))
    summ = pd.read_csv(out / "region-summary.csv")
    assert summ["n_px"].sum() == regions["n_px"].sum()

    out2 = tmp_path / "cli_prox"
    r = subprocess.run(
        [sys.executable, "-m", "spatial_aez_ray", "--num-cpus", "2",
         "proximity", "--world", tiny_world, "--out", str(out2)],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    hist = pd.read_csv(out2 / "proximity-histogram.csv")
    assert hist.astype("int64").equals(
        oracle.proximity_oracle(fixtures.TINY, "lc", 210).astype("int64"))


def test_cli_terrain(tiny_world, tmp_path):
    import pandas as pd
    out = tmp_path / "cli_terrain"
    r = subprocess.run(
        [sys.executable, "-m", "spatial_aez_ray", "--num-cpus", "2",
         "terrain", "--world", tiny_world, "--out", str(out),
         "--metric", "roughness", "--zonal"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_csv(out / "terrain-roughness-zonal.csv")
    from spatial_aez_ray import fixtures, oracle
    want = oracle.zonal_window_stats_oracle(fixtures.TINY, "kg",
                                            "roughness")
    got = df.set_index("admin").astype("int64")
    assert got.equals(want.set_index("admin").astype("int64"))
