"""Trace-cache (utils/progcache.py) roundtrip tests.

The cache must be a pure accelerator: identical results whether a program
is exported fresh, loaded from disk, or the cache is disabled — and a
disk hit must not re-trace the Python function.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import struct

from dynamicscaler_tpu.utils import progcache
from dynamicscaler_tpu.utils.progcache import cached_jit


@struct.dataclass
class _Sched:
    a: jax.Array
    b: jax.Array


@pytest.fixture()
def cachedir(tmp_path, monkeypatch):
    monkeypatch.setenv("DSCALER_TRACE_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("DSCALER_NO_TRACE_CACHE", raising=False)
    yield str(tmp_path)


def _fn(sched, x, mask, key):
    noise = jax.random.normal(key, x.shape)
    y = x * sched.a.sum() + sched.b.mean()
    if mask is not None:
        y = jnp.where(mask > 0, y, x)
    return y + 0.001 * noise, {"m": y.mean()}


def _args(with_mask=True):
    sched = _Sched(a=jnp.arange(4.0), b=jnp.ones((3,)))
    x = jnp.linspace(0, 1, 64).reshape(8, 8)
    mask = jnp.tile(jnp.asarray([1.0, 0.0]), (8, 4)) if with_mask else None
    key = jax.random.PRNGKey(7)
    return sched, x, mask, key


def test_roundtrip_matches_plain_jit(cachedir):
    f = cached_jit(_fn, name="t1", fingerprint="fp")
    out = f(*_args())
    ref = jax.jit(_fn)(*_args())
    np.testing.assert_allclose(out[0], ref[0], rtol=1e-6)
    np.testing.assert_allclose(out[1]["m"], ref[1]["m"], rtol=1e-6)
    assert len(os.listdir(cachedir)) == 1


def test_disk_hit_skips_tracing(cachedir):
    calls = []

    def fn(x):
        calls.append(1)
        return x * 2

    f1 = cached_jit(fn, name="t2")
    x = jnp.ones((4,))
    r1 = f1(x)
    assert calls  # traced once
    calls.clear()
    f2 = cached_jit(fn, name="t2")  # fresh wrapper, same key -> disk hit
    r2 = f2(x)
    assert not calls, "disk hit must not re-trace the Python function"
    np.testing.assert_allclose(r1, r2)


def test_none_args_are_distinct_signatures(cachedir):
    f = cached_jit(_fn, name="t3")
    o1 = f(*_args(with_mask=True))
    o2 = f(*_args(with_mask=False))
    assert len(os.listdir(cachedir)) == 2
    assert not np.allclose(o1[0], o2[0])


def test_disabled_env_falls_back(cachedir, monkeypatch):
    monkeypatch.setenv("DSCALER_NO_TRACE_CACHE", "1")
    f = cached_jit(_fn, name="t4")
    out = f(*_args())
    ref = jax.jit(_fn)(*_args())
    np.testing.assert_allclose(out[0], ref[0], rtol=1e-6)
    assert len(os.listdir(cachedir)) == 0


def test_corrupt_cache_file_falls_back(cachedir):
    f = cached_jit(_fn, name="t5")
    f(*_args())
    (entry,) = os.listdir(cachedir)
    with open(os.path.join(cachedir, entry), "wb") as fh:
        fh.write(b"garbage")
    f2 = cached_jit(_fn, name="t5")
    out = f2(*_args())
    ref = jax.jit(_fn)(*_args())
    np.testing.assert_allclose(out[0], ref[0], rtol=1e-6)


def test_static_argnums(cachedir):
    def fn(x, k):
        return x * k

    f = cached_jit(fn, name="t6", static_argnums=(1,))
    np.testing.assert_allclose(f(jnp.ones((3,)), 2.0), 2.0)
    np.testing.assert_allclose(f(jnp.ones((3,)), 3.0), 3.0)
    assert len(os.listdir(cachedir)) == 2  # distinct static values


def test_prewarm_populates_registry(cachedir):
    calls = []

    def fn(x):
        calls.append(1)
        return x * 3

    x = jnp.ones((5,))
    cached_jit(fn, name="t8")(x)  # export + save
    assert calls
    calls.clear()
    # simulate a fresh process: drop the in-memory registry
    with progcache._REGISTRY_LOCK:
        progcache._REGISTRY.clear()
    progcache.prewarm(priority=("t8",), block=True)
    with progcache._REGISTRY_LOCK:
        assert any(e[2] == "prewarmed" for e in progcache._REGISTRY.values())
    out = cached_jit(fn, name="t8")(x)  # must hit the prewarmed entry
    assert not calls, "prewarmed hit must not re-trace"
    np.testing.assert_allclose(out, 3.0)


def test_prewarm_skips_stale_code_version(cachedir, monkeypatch):
    def fn(x):
        return x + 1

    x = jnp.ones((2,))
    cached_jit(fn, name="t9")(x)
    with progcache._REGISTRY_LOCK:
        progcache._REGISTRY.clear()
    # flip the code version: the on-disk entry must be ignored
    monkeypatch.setenv("DSCALER_FUSE_DISABLE", "block")
    progcache._code_version = None
    progcache.prewarm(block=True)
    with progcache._REGISTRY_LOCK:
        assert not progcache._REGISTRY
    progcache._code_version = None


def test_env_fingerprint_invalidates(cachedir, monkeypatch):
    f1 = cached_jit(_fn, name="t7")
    f1(*_args())
    n1 = len(os.listdir(cachedir))
    # a program-shaping env var must change the key
    monkeypatch.setenv("DSCALER_FUSE_DISABLE", "mega")
    progcache._code_version = None  # recompute (normally process-constant)
    f2 = cached_jit(_fn, name="t7")
    f2(*_args())
    progcache._code_version = None
    monkeypatch.delenv("DSCALER_FUSE_DISABLE")
    assert len(os.listdir(cachedir)) == n1 + 1


def test_mesh_sharded_roundtrip(cachedir):
    """cached_jit must export/load/run programs whose inputs are sharded
    over a device mesh — the sharded step programs and dryrun_multichip
    path. Regression: jax.export without explicit platforms= raised
    'lowering_platforms ... required when only AbstractMesh exists' and
    silently fell back to plain jit (MULTICHIP_r04 tail)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x = jax.device_put(
        jnp.arange(32.0).reshape(8, 4), NamedSharding(mesh, P("data", None))
    )

    def fn(a):
        return (a * 2).sum()

    f = cached_jit(fn, name="tmesh")
    out1 = float(f(x))
    assert out1 == float(jax.jit(fn)(x))
    assert len(os.listdir(cachedir)) == 1  # exported, not plain-jit fallback

    # under an active mesh context too (how dryrun_multichip traces), and
    # through the disk-load path (fresh registry)
    with _fresh_registry():
        with jax.sharding.set_mesh(mesh):
            f2 = cached_jit(fn, name="tmesh")
            assert float(f2(x)) == out1
    assert len(os.listdir(cachedir)) == 1  # same key: loaded, no re-export


def _fresh_registry():
    import contextlib

    @contextlib.contextmanager
    def cm():
        with progcache._REGISTRY_LOCK:
            saved = dict(progcache._REGISTRY)
            progcache._REGISTRY.clear()
        try:
            yield
        finally:
            with progcache._REGISTRY_LOCK:
                progcache._REGISTRY.update(saved)

    return cm()
