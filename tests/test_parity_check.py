"""Parity-check harness tests (fast mode, synthetic corpus).

The harness's job is mechanical: run all tiers, extract exactly the cells
BASELINE.md pins, compare with tolerances, report.  These tests exercise
that machinery end-to-end on a tiny synthetic corpus — the VALUES won't
match the real-FMA reference numbers (and must not be asserted to), but
every cell must be populated and the comparison/report plumbing must work.
"""
import csv

import numpy as np
import pytest

from vae_hmc_tpu.core.config import Workspace
from vae_hmc_tpu.pipelines import parity
from vae_hmc_tpu.pipelines.sources import SyntheticSource


@pytest.fixture(scope="module")
def parity_rows(tmp_path_factory):
    ws = Workspace(tmp_path_factory.mktemp("parity_ws"))
    src = SyntheticSource.make(24, seed=42, lyrics_coverage=0.9)
    return parity.run_parity_check(src, ws, fast=True, device_batch=12)


def test_every_reference_cell_is_populated(parity_rows):
    assert {r.name for r in parity_rows} == set(parity.REFERENCE_CELLS)
    missing = [r.name for r in parity_rows if r.ours is None]
    assert not missing, f"cells with no extracted value: {missing}"


def test_row_semantics_and_table(parity_rows):
    for r in parity_rows:
        assert np.isfinite(r.ours), r.name
        # silhouette-type cells must be in-range
        if r.name.endswith((".silhouette", ".ari", ".nmi", ".purity")):
            assert -1.0 - 1e-6 <= r.ours <= 1.0 + 1e-6, (r.name, r.ours)
        # tolerance semantics
        assert r.passed == (abs(r.ours - r.ref) <= r.tol)
    table = parity.format_table(parity_rows)
    assert "cells within tolerance" in table
    assert all(r.name in table for r in parity_rows)


def test_report_csv_roundtrip(parity_rows, tmp_path):
    p = tmp_path / "parity_report.csv"
    parity.save_report(parity_rows, p)
    with open(p, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(parity.REFERENCE_CELLS)
    assert {"cell", "reference", "ours", "tol", "passed",
            "reference_source"} <= set(rows[0])
    # reference values must match BASELINE.md's committed numbers
    by_name = {r["cell"]: float(r["reference"]) for r in rows}
    assert by_name["easy.vae_kmeans.silhouette"] == pytest.approx(0.26059)
    assert by_name["hard.beta_vae.purity"] == pytest.approx(0.36743)
