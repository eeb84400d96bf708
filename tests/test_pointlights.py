"""Point lights (VERDICT r1 item 8): per-ray shadow directions, inverse-square
falloff, distance-clamped occlusion, CPU-oracle goldens, and light-position
gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from ref import cpu_renderer
from tpu_ray.render.render import render_image
from tpu_ray.scene.scenes import build_scene
from tpu_ray.scene.types import Lights
from tpu_ray.utils.gradcheck import check_grad


def _pl_scene(dtype=jnp.float64):
    scene, cfg = build_scene("pointlight", dtype=dtype)
    return scene, cfg.replace(width=24, height=24, block_size=0)


def test_pointlight_golden_soft():
    scene, cfg = _pl_scene()
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_pointlight_golden_hard():
    scene, cfg = _pl_scene()
    cfg = cfg.replace(shadow="hard")
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_pointlight_soft_diff_vis_matches_static():
    """The residual-based differentiable penumbra recompute must reproduce
    the marched forward value exactly."""
    scene, cfg = _pl_scene()
    a = np.asarray(render_image(scene, cfg.replace(diff_vis=False)))
    b = np.asarray(render_image(scene, cfg.replace(diff_vis=True)))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_occluder_beyond_light_does_not_block():
    """A blocker farther along the shadow ray than the light itself must not
    cast a shadow (the t_far clamp at the light distance)."""
    scene, cfg = _pl_scene()
    # light straight above the origin; blocker sphere far above the light
    lights = Lights.make([[0.0, 1.0, 0.0]], [[0.0, 0.0, 0.0]],
                         ambient=(0.0, 0.0, 0.0), dtype=jnp.float64,
                         positions=[[0.0, 1.0, 0.0]], pos_colors=[[3.0, 3.0, 3.0]])
    base = scene.replace(
        lights=lights,
        sdf=scene.sdf.replace(  # keep only the ground plane
            sph_center=jnp.zeros((0, 3), jnp.float64),
            sph_radius=jnp.zeros((0,), jnp.float64),
            sph_mat=jnp.zeros((0,), jnp.int32),
            box_center=jnp.zeros((0, 3), jnp.float64),
            box_half=jnp.zeros((0, 3), jnp.float64),
            box_round=jnp.zeros((0,), jnp.float64),
            box_mat=jnp.zeros((0,), jnp.int32)))
    with_blocker = base.replace(sdf=base.sdf.replace(
        sph_center=jnp.asarray([[0.0, 4.0, 0.0]], jnp.float64),
        sph_radius=jnp.asarray([0.5], jnp.float64),
        sph_mat=jnp.asarray([0], jnp.int32)))
    for shadow in ("hard", "soft"):
        c = cfg.replace(shadow=shadow)
        a = np.asarray(render_image(base, c))
        b = np.asarray(render_image(with_blocker, c))
        # the floor directly under the light must be identically lit
        cy, cx = cfg.height // 2, cfg.width // 2
        np.testing.assert_allclose(b[cy - 2:cy + 2, cx - 2:cx + 2],
                                   a[cy - 2:cy + 2, cx - 2:cx + 2], atol=1e-9)


def test_pointlight_mesh_shadow_golden():
    """Point light over the triangle scene: mesh any-hit along the
    unnormalized surface->light segment, vs the CPU oracle."""
    scene, cfg = build_scene("triangles", dtype=jnp.float64)
    cfg = cfg.replace(width=20, height=20, block_size=0)
    scene = scene.replace(lights=Lights.make(
        [[0.6, 0.8, 0.3]], [[0.3, 0.3, 0.3]], dtype=jnp.float64,
        positions=[[0.0, 3.0, 1.0]], pos_colors=[[8.0, 8.0, 8.0]]))
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_grad_light_position_fd():
    """FD vs AD for the point-light position through falloff, ndotl and the
    differentiable soft-shadow penumbra."""
    scene, cfg = _pl_scene()
    cfg = cfg.replace(shadow="soft", diff_vis=True)
    base = render_image(scene, cfg)
    target = jax.lax.stop_gradient(base + 0.1)

    def loss(pos):
        s = scene.replace(lights=scene.lights.replace(position=pos))
        img = render_image(s, cfg)
        return jnp.mean((img - target) ** 2)

    # rtol 3e-2: the penumbra gradient uses the envelope theorem at the
    # DISCRETE march argmin (render.py sh_ts residual); FD sees the argmin
    # step index jump as the light moves, a discretization the continuous
    # envelope gradient correctly ignores. Falloff/ndotl terms agree to ~1e-3.
    check_grad(loss, scene.lights.position, eps=1e-5, rtol=3e-2, atol=1e-8)


def test_pointlight_pallas_matches_jnp():
    """The per-ray-t_far pallas shadow kernel (7th ray operand) must match
    the jnp path, interpret mode, both shadow modes."""
    scene, cfg = build_scene("pointlight", dtype=jnp.float32)
    cfg = cfg.replace(width=24, height=24, block_size=0)
    for shadow in ("hard", "soft"):
        c = cfg.replace(shadow=shadow)
        a = np.asarray(render_image(scene, c.replace(pallas="off")))
        b = np.asarray(render_image(scene, c.replace(pallas="on")))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_pointlight_pallas_occluder_beyond_light():
    """ADVICE r2 (high): shadow_pallas must honor the per-ray t_far clamp —
    a blocker BEYOND the point light must not darken the pallas render.
    Checks pallas==jnp with the beyond-light blocker present, both modes."""
    scene, cfg = build_scene("pointlight", dtype=jnp.float32)
    cfg = cfg.replace(width=24, height=24, block_size=0)
    lights = Lights.make([[0.0, 1.0, 0.0]], [[0.0, 0.0, 0.0]],
                         ambient=(0.0, 0.0, 0.0), dtype=jnp.float32,
                         positions=[[0.0, 1.0, 0.0]],
                         pos_colors=[[3.0, 3.0, 3.0]])
    base = scene.replace(
        lights=lights,
        sdf=scene.sdf.replace(  # ground plane only
            sph_center=jnp.zeros((0, 3), jnp.float32),
            sph_radius=jnp.zeros((0,), jnp.float32),
            sph_mat=jnp.zeros((0,), jnp.int32),
            box_center=jnp.zeros((0, 3), jnp.float32),
            box_half=jnp.zeros((0, 3), jnp.float32),
            box_round=jnp.zeros((0,), jnp.float32),
            box_mat=jnp.zeros((0,), jnp.int32)))
    blocked = base.replace(sdf=base.sdf.replace(
        sph_center=jnp.asarray([[0.0, 4.0, 0.0]], jnp.float32),
        sph_radius=jnp.asarray([0.5], jnp.float32),
        sph_mat=jnp.asarray([0], jnp.int32)))
    cy, cx = cfg.height // 2, cfg.width // 2
    for shadow in ("hard", "soft"):
        c = cfg.replace(shadow=shadow)
        ref_img = np.asarray(render_image(blocked, c.replace(pallas="off")))
        got = np.asarray(render_image(blocked, c.replace(pallas="on")))
        np.testing.assert_allclose(got, ref_img, atol=2e-5)
        # and the floor under the light is as lit as with no blocker at all
        clean = np.asarray(render_image(base, c.replace(pallas="on")))
        np.testing.assert_allclose(got[cy - 2:cy + 2, cx - 2:cx + 2],
                                   clean[cy - 2:cy + 2, cx - 2:cx + 2],
                                   atol=2e-5)
