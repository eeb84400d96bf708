"""Loaders (OBJ/PLY), jittered sampling, and debug/sanitizer utilities."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ray.scene.mesh import load_obj, load_ply


def test_obj_loader_roundtrip(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3 1\n")
    v, f = load_obj(str(p))
    assert v.shape == (4, 3)
    # quad face triangulated as a fan: 1 + 2 triangles
    assert f.shape == (3, 3)


def test_ply_ascii_loader(tmp_path):
    p = tmp_path / "t.ply"
    p.write_bytes(b"""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
""")
    v, f = load_ply(str(p))
    np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_ply_binary_loader(tmp_path):
    p = tmp_path / "b.ply"
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 3\nproperty float x\nproperty float y\nproperty float z\n"
              b"element face 2\nproperty list uchar int vertex_indices\nend_header\n")
    body = b"".join(struct.pack("<3f", *v) for v in
                    [(0, 0, 0), (1, 0, 0), (0, 1, 1)])
    body += struct.pack("<B3i", 3, 0, 1, 2)
    body += struct.pack("<B4i", 4, 0, 1, 2, 0)  # quad -> 2 fan tris
    p.write_bytes(header + body)
    v, f = load_ply(str(p))
    assert v.shape == (3, 3) and f.shape == (3, 3)
    np.testing.assert_allclose(v[2], [0, 1, 1])


def test_jittered_sampling_deterministic_and_stratified():
    from tpu_ray.render.render import pixel_sample_coords
    from tpu_ray.scene.scenes import build_scene

    _, cfg = build_scene("sphere")
    cfg = cfg.replace(width=8, height=8, spp=4, jitter_seed=7)
    sx1, sy1 = pixel_sample_coords(cfg, jnp.float32)
    sx2, sy2 = pixel_sample_coords(cfg, jnp.float32)
    np.testing.assert_array_equal(np.asarray(sx1), np.asarray(sx2))
    # each sample stays within its own pixel
    px = np.floor(np.asarray(sx1))
    assert (px == np.arange(8)[None, :, None]).all()
    # jitter differs from the deterministic stratified centers
    sx0, _ = pixel_sample_coords(cfg.replace(jitter_seed=None), jnp.float32)
    assert np.abs(np.asarray(sx1) - np.asarray(sx0)).max() > 1e-3


def test_checked_raises_on_nan():
    import jax
    from tpu_ray.utils.debug import checked

    f = checked(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x))
    f(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))  # sqrt(-1) -> NaN


def test_assert_finite():
    from tpu_ray.utils.debug import assert_finite

    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(AssertionError):
        assert_finite({"a": jnp.asarray([jnp.nan])})
