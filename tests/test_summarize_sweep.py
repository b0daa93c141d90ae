"""scripts/summarize_sweep.py — eval_t60_sweep log lines -> markdown tables."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

SAMPLE = """\
some unrelated log line
t60=0.3,R=0.7: {"median_abs_radians": 0.021, "frac_err_gt_0.1rad": 0.01, "rmse_coordinates_m": 0.05}
t60=0.3,R=1: {"median_abs_radians": 0.034, "frac_err_gt_0.1rad": 0.02, "rmse_coordinates_m": 0.07}
t60=0.5,R=0.7: {"median_abs_radians": 0.044, "frac_err_gt_0.1rad": 0.03, "rmse_coordinates_m": 0.06}
t60=0.4,snr=0dB: {"median_abs_radians": 0.065, "frac_err_gt_0.1rad": 0.08, "rmse_coordinates_m": 0.11}
{"model": "joint", "t60_grid": [0.3], "radius_grid": [0.7]}
"""


def run_summarizer(text, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "summarize_sweep.py"), *args],
        input=text, capture_output=True, text=True, cwd=REPO,
    )


def test_renders_grid_tables_from_stdin():
    res = run_summarizer(SAMPLE)
    assert res.returncode == 0, res.stderr
    out = res.stdout
    assert "**median_abs_radians**" in out
    assert "| T60 | R=0.7 | R=1 | snr=0dB |" in out
    # rows sorted numerically by T60; cells formatted to 3 decimals
    r03 = next(line for line in out.splitlines() if line.startswith("| 0.3 |"))
    assert r03 == "| 0.3 | 0.021 | 0.034 | — |"
    r04 = next(line for line in out.splitlines() if line.startswith("| 0.4 |"))
    assert r04.endswith("| 0.065 |") and "— | —" in r04


def test_metric_selection_and_missing_metric_skipped():
    res = run_summarizer(SAMPLE, "--metrics", "rmse_coordinates_m", "not_a_metric")
    assert res.returncode == 0, res.stderr
    assert "**rmse_coordinates_m**" in res.stdout
    assert "not_a_metric" not in res.stdout


def test_no_cells_is_an_error():
    res = run_summarizer("no grid lines here\n")
    assert res.returncode != 0
    assert "no grid-cell lines" in res.stderr
