"""Checkpoint/resume tests (SURVEY.md §5): orbax roundtrip and the
kill-mid-fit resume-equivalence property (fault injection analog)."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from tpu_ray.fit import extract_params, fit
from tpu_ray.render.render import render_image
from tpu_ray.scene.scenes import build_scene
from tpu_ray.utils import checkpoint as ckpt_lib
from tpu_ray.utils.config import FitConfig


def test_orbax_roundtrip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.asarray([1.5])}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    mngr = ckpt_lib.make_manager(str(tmp_path / "ck"))
    ckpt_lib.save(mngr, 3, params, state)
    mngr.wait_until_finished()
    restored = ckpt_lib.restore_latest(mngr, params, state)
    assert restored is not None
    p2, s2, step = restored
    assert step == 3
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(p2["b"]), np.asarray(params["b"]))


def test_restore_empty_dir_returns_none(tmp_path):
    params = {"a": jnp.zeros(3)}
    opt = optax.adam(1e-2)
    mngr = ckpt_lib.make_manager(str(tmp_path / "empty"))
    assert ckpt_lib.restore_latest(mngr, params, opt.init(params)) is None


def test_fit_resume_equivalence(tmp_path):
    """Killing fit mid-run and resuming from the checkpoint must land on the
    same trajectory as an uninterrupted run (deterministic renderer)."""
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=12, height=12, block_size=0)
    target = render_image(
        scene.replace(sdf=scene.sdf.replace(sph_radius=jnp.asarray([1.2]))), cfg)
    trainable = ("sdf.sph_radius",)

    # uninterrupted: 10 steps
    full_scene, full_hist = fit(scene, cfg, target, trainable,
                                FitConfig(steps=10, learning_rate=2e-2),
                                verbose=False)

    # interrupted: run 10 steps with checkpoint_every=5, then "crash" and
    # resume — the resumed run must continue from step 5 and match.
    ckdir = str(tmp_path / "fitck")
    fit(scene, cfg, target, trainable,
        FitConfig(steps=5, learning_rate=2e-2, checkpoint_every=5,
                  checkpoint_dir=ckdir), verbose=False)
    resumed_scene, resumed_hist = fit(
        scene, cfg, target, trainable,
        FitConfig(steps=10, learning_rate=2e-2, checkpoint_every=5,
                  checkpoint_dir=ckdir), verbose=False)
    np.testing.assert_allclose(
        float(resumed_scene.sdf.sph_radius[0]),
        float(full_scene.sdf.sph_radius[0]), rtol=1e-12)
    np.testing.assert_allclose(resumed_hist, full_hist[5:], rtol=1e-9)
