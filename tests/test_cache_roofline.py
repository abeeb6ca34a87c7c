"""Persistent-compile-cache helper + analytic roofline library."""

import os

import numpy as np


def test_enable_compilation_cache_sets_config(tmp_path, monkeypatch):
    import segtpu.utils.cache as C
    import jax
    monkeypatch.setattr(C, "_ENABLED_DIR", None)
    d = str(tmp_path / "xla")
    got = C.enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call returns the first dir, ignores new arg
    assert C.enable_compilation_cache(str(tmp_path / "other")) == d


def test_enable_compilation_cache_disabled(tmp_path, monkeypatch):
    import segtpu.utils.cache as C
    monkeypatch.setattr(C, "_ENABLED_DIR", None)
    monkeypatch.setenv("SEGTPU_NO_CACHE", "1")
    assert C.enable_compilation_cache(str(tmp_path / "x")) is None


def test_roofline_totals_and_segments():
    from segtpu.utils.roofline import compute_roofline
    r = compute_roofline(1024, 2048, "arch0", num_classes=19)
    names = [s["name"] for s in r["segments"]]
    assert len(names) == 5 and any("decoder" in n for n in names)
    assert abs(sum(s["achievable_ms"] for s in r["segments"])
               - r["total_ms"]) < 1e-9
    # the published round-2 figures: ~0.93 ms/frame, ~94 GF/frame
    assert 0.7 < r["total_ms"] < 1.2
    assert 80 < r["gflop_total"] < 110
    assert abs(r["roofline_ips"] - 1e3 / r["total_ms"]) < 1e-6
    # smaller shape -> faster
    r2 = compute_roofline(512, 512, "arch0", num_classes=21)
    assert r2["total_ms"] < r["total_ms"]
