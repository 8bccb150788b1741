"""bench.py host-health probe cleanliness law (r04 amendment): a
faster-than-healthy probe can never flag a window dirty — contention
is witnessed only by slowness."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _load_bench():
    argv = sys.argv
    sys.argv = ["bench.py"]
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_under_test", Path(__file__).resolve().parents[1] / "bench.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.argv = argv


BENCH = _load_bench()


def _clean(a: float, b: float) -> bool:
    return BENCH._probe_clean({"sort20M_s": a}, {"sort20M_s": b})


def test_both_fast_is_clean():
    assert _clean(0.3, 1.5)
    assert _clean(1.6, 1.6)


def test_fast_before_normal_after_is_clean():
    # the r04 false-flag shape: idle-boost probe then healthy probe
    assert _clean(0.495, 1.73)
    assert _clean(0.678, 2.046)
    assert _clean(2.189, 0.738)  # symmetric


def test_contention_edge_still_flags():
    assert not _clean(2.9, 27.0)  # the measured co-tenant signature
    assert not _clean(1.0, 3.9)  # near-contended far side, 2.4x over floor
    assert not _clean(5.0, 5.0)  # both beyond the healthy ceiling


def test_agreement_within_band_is_clean():
    assert _clean(2.9, 2.7)  # the r03 headline's accepted shape


def test_compare_with_prior_contract(tmp_path):
    prior = tmp_path / "prior.json"
    prior.write_text(
        '{"parsed": {"probe_clean": true, "queries": {"wand_topk": 1.0}, '
        '"tiered": {}, "extra": {"x_bytes": 5, "prf": 2.0}}}'
    )
    out = {
        "probe_clean": True,
        "queries": {"wand_topk": 1.4},
        "tiered": {},
        "extra": {"x_bytes": 900, "prf": 2.1},
    }
    c = BENCH.compare_with_prior(out, str(prior))
    assert c["comparable"] and c["n_phases_compared"] == 2  # bytes excluded
    assert set(c["regressions"]) == {"wand_topk"}
    out["probe_clean"] = False
    assert not BENCH.compare_with_prior(out, str(prior))["comparable"]
