"""The C++ packet-accel builder (tpu_ray/native/accel_build.cpp) must be
BIT-IDENTICAL to the numpy reference build — same Morton order, same float
casts, same padding — so the native fast path is invisible downstream
(kernels, refit, caches). Skips when no compiler/library is available."""

import numpy as np
import pytest

import tpu_ray.accel.packet as pk
from tpu_ray.native import accel_lib
from tpu_ray.scene.mesh import torus_knot

pytestmark = pytest.mark.skipif(accel_lib() is None,
                                reason="native accel builder unavailable")


def _numpy_build(monkeypatch, *args, **kw):
    with monkeypatch.context() as m:
        m.setattr(pk, "_native_build", lambda *a: None)
        return pk.build_packet_accel(*args, **kw)


def _assert_bit_equal(got, want):
    for field in ("corners", "chunk_aabb", "super_aabb", "perm"):
        g = np.asarray(getattr(got, field))
        w = np.asarray(getattr(want, field))
        assert g.shape == w.shape, field
        np.testing.assert_array_equal(g, w, err_msg=field)
    assert got.num_tris == want.num_tris


@pytest.mark.parametrize("knot", [(2, 3, 37, 21),    # 1,554 tris (pad-heavy)
                                  (2, 3, 128, 100),  # 25,600 tris
                                  (3, 5, 200, 160)])  # 64,000 tris
def test_native_build_bit_equals_numpy(monkeypatch, knot):
    v, f = torus_knot(*knot)
    got = pk.build_packet_accel(v, f)
    want = _numpy_build(monkeypatch, v, f)
    _assert_bit_equal(got, want)


def test_native_build_with_tri_id_base(monkeypatch):
    v, f = torus_knot(2, 3, 64, 48)  # 6,144 tris
    base = np.arange(f.shape[0])[::-1].copy()  # non-identity original ids
    got = pk.build_packet_accel(v, f, tri_id_base=base)
    want = _numpy_build(monkeypatch, v, f, tri_id_base=base)
    _assert_bit_equal(got, want)


def test_native_parts_split_bit_equals_numpy(monkeypatch):
    """The legacy VMEM-split path routes each part through the builder with
    tri_id_base subsets — native and numpy splits must agree part by part."""
    v, f = torus_knot(2, 3, 160, 120)  # 38,400 tris
    budget = pk.packet_accel_bytes(pk.CHUNK * pk.SUPER * 4)  # force ~5 parts
    got = pk.build_packet_parts(v, f, budget_bytes=budget, streamed=False)
    with monkeypatch.context() as m:
        m.setattr(pk, "_native_build", lambda *a: None)
        want = pk.build_packet_parts(v, f, budget_bytes=budget, streamed=False)
    assert len(got) == len(want) and len(got) > 1
    for g, w in zip(got, want):
        _assert_bit_equal(g, w)
