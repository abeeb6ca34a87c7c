"""AOT program store (utils/aot.py) — VERDICT r4 next#6: an untested
cache keyed on hand-rolled invalidation sitting in the production
Segmenter._compiled path fails by silently serving a stale program.
Fast tier: store->hit bit-identical outputs, digest invalidation,
SEGTPU_NO_AOT bypass, corrupt-store fallback."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import segtpu.utils.aot as aot


@pytest.fixture()
def store(tmp_path, monkeypatch):
    """Isolated AOT store dir + a reset code digest per test."""
    monkeypatch.setenv("SEGTPU_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.delenv("SEGTPU_NO_AOT", raising=False)
    monkeypatch.setattr(aot, "_CODE_DIGEST", None)
    return tmp_path / "aot"


def _fn(x):
    return jnp.tanh(x @ x.T) * 2.0


def _arg():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(8, 16).astype(np.float32))


def test_store_then_hit_bit_identical(store):
    x = _arg()
    p1 = aot.aot_jit(_fn, "k1", x)
    assert p1.aot_hit is False
    want = np.asarray(p1(x))
    files = list(store.glob("*.jaxexport"))
    assert len(files) == 1, "export not written"

    p2 = aot.aot_jit(_fn, "k1", x)
    assert p2.aot_hit is True, "second build must load from the store"
    np.testing.assert_array_equal(np.asarray(p2(x)), want)


def test_key_change_misses(store):
    x = _arg()
    aot.aot_jit(_fn, "k1", x)
    p = aot.aot_jit(_fn, "k2", x)
    assert p.aot_hit is False
    assert len(list(store.glob("*.jaxexport"))) == 2


def test_code_digest_invalidates(store, monkeypatch):
    """A one-byte source change moves the digest -> miss (the stale-
    program failure mode this store must never have). The digest input
    is monkeypatched rather than editing files on disk."""
    x = _arg()
    p1 = aot.aot_jit(_fn, "k1", x)
    assert p1.aot_hit is False
    monkeypatch.setattr(aot, "_CODE_DIGEST", "deadbeefdeadbeef")
    p2 = aot.aot_jit(_fn, "k1", x)
    assert p2.aot_hit is False, "changed code digest must not hit"
    assert len(list(store.glob("*.jaxexport"))) == 2


def test_no_aot_env_bypasses(store, monkeypatch):
    monkeypatch.setenv("SEGTPU_NO_AOT", "1")
    x = _arg()
    p = aot.aot_jit(_fn, "k1", x)
    assert p.aot_hit is False and p.exported is None
    assert list(store.glob("*.jaxexport")) == []
    # still a working program
    np.testing.assert_allclose(np.asarray(p(x)),
                               np.asarray(jax.jit(_fn)(x)), rtol=1e-6)


def test_corrupt_store_falls_back(store):
    x = _arg()
    p1 = aot.aot_jit(_fn, "k1", x)
    want = np.asarray(p1(x))
    (f,) = store.glob("*.jaxexport")
    f.write_bytes(b"not a serialized export")
    p2 = aot.aot_jit(_fn, "k1", x)
    assert p2.aot_hit is False, "corrupt artifact must re-trace"
    np.testing.assert_array_equal(np.asarray(p2(x)), want)


def test_lower_forwarded(store):
    x = _arg()
    p = aot.aot_jit(_fn, "k1", x)
    assert p.lower(x).out_info.shape == (8, 8)
