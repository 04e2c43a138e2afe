"""tools/datagen.py claims byte-level determinism under a fixed seed —
pin it, since reproducible inputs are what make replay/debug possible."""

from __future__ import annotations

import filecmp
import os
import sys
from datetime import date

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from datagen import generate_day  # noqa: E402


def test_same_seed_same_bytes(tmp_path):
    a = generate_day(str(tmp_path / "a"), date(2024, 6, 1), n_orders=200, seed=7)
    b = generate_day(str(tmp_path / "b"), date(2024, 6, 1), n_orders=200, seed=7)
    files = sorted(os.listdir(a))
    assert files == sorted(os.listdir(b)) and len(files) == 10
    for f in files:
        assert filecmp.cmp(os.path.join(a, f), os.path.join(b, f), shallow=False), f


def test_different_seed_different_bytes(tmp_path):
    a = generate_day(str(tmp_path / "a"), date(2024, 6, 1), n_orders=200, seed=7)
    c = generate_day(str(tmp_path / "c"), date(2024, 6, 1), n_orders=200, seed=8)
    assert not filecmp.cmp(
        os.path.join(a, "orders.csv"), os.path.join(c, "orders.csv"), shallow=False
    )


def test_delta_day_reemits_subset_plus_new_keys(tmp_path):
    full = generate_day(str(tmp_path / "d"), date(2024, 6, 1), n_orders=200, seed=7)
    delta = generate_day(
        str(tmp_path / "d"), date(2024, 6, 2), n_orders=200, seed=7, delta_frac=0.1
    )
    n_full = sum(1 for _ in open(os.path.join(full, "orders.csv"))) - 1
    n_delta = sum(1 for _ in open(os.path.join(delta, "orders.csv"))) - 1
    assert n_full == 200
    assert 0 < n_delta < n_full  # updates + some new keys, not a full re-dump
