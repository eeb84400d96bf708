"""One JAX process of a 2-process CPU group (tests/test_multiprocess.py).

Not a pytest module — launched as a subprocess:

    python multiprocess_worker.py <coordinator> <process_id> <outdir>

Exercises the REAL multi-process wiring (SURVEY.md §2b C1, §4.4; VERDICT r4
item 5): `multihost.initialize` with an explicit coordinator, a sharded
render over the global 8-device (2 process x 4 local) mesh asserted equal to
the single-device render, one DP fit step with bucketed psums, and the
process-0-gated image write.
"""

import os
import sys

# Must precede any jax import in THIS process; the launcher also sets these
# in the subprocess env so the sitecustomize TPU claim never happens.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from tpu_ray.dist import multihost

    multihost.initialize(coordinator_address=coord, num_processes=2,
                         process_id=pid)

    import numpy as np
    import jax
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8
    assert multihost.is_main() == (pid == 0)

    import optax
    from tpu_ray.dist.sharding import make_mesh, render_image_sharded
    from tpu_ray.fit import extract_params, make_sharded_fit_step
    from tpu_ray.render.render import render_image
    from tpu_ray.scene.scenes import build_scene

    scene, cfg = build_scene("sphere", dtype=jnp.float32)
    cfg = cfg.replace(width=32, height=32)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    # sharded render over BOTH processes' devices == local single-device
    img = jax.jit(lambda s: render_image_sharded(s, cfg, mesh))(scene)
    ref = jax.jit(render_image, static_argnums=1)(scene, cfg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)

    # process-0-gated write of the gathered (replicated) frame
    out_png = os.path.join(outdir, "mp_render.png")
    multihost.write_image_per_host(out_png, img)
    if pid == 0:
        assert os.path.exists(out_png)

    # one DP fit step: per-shard grads + bucketed psum (grad_allreduce)
    target = np.asarray(ref) + 0.1
    params = extract_params(scene, ["sdf.sph_radius", "materials.albedo"])
    opt = optax.adam(1e-2)
    step = make_sharded_fit_step(scene, cfg, jnp.asarray(target), opt, mesh)
    p2, _st, loss = step(params, opt.init(params))
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0.0
    # the step must have moved the params (grads were nonzero and synced)
    assert float(jnp.abs(p2["sdf.sph_radius"]
                         - params["sdf.sph_radius"]).max()) > 0.0
    print(f"OK p{pid} loss={loss:.6f}")


if __name__ == "__main__":
    main()
