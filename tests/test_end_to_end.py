"""End-to-end: dummy cube scene -> renderer forward -> train steps.

This is Milestone A of the build plan (SURVEY.md §7): the minimum slice on the
CPU-runnable dummy scene with the FourierFeatures encoder (BASELINE.json
config 1), plus a tiny StyleModNFFB run to cover the flagship path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.config import hocon
from hashmodnffbanks_idr_tpu.data.dummy import generate_dummy_scene
from hashmodnffbanks_idr_tpu.data.scene_dataset import SceneDataset

CONF_DIR = os.path.join(os.path.dirname(__file__), "..",
                        "hashmodnffbanks_idr_tpu", "config", "confs")

SMALL_MODEL_PATCH = {
    "model.implicit_network.dims": [64, 64, 64, 64, 64, 64],
    "model.rendering_network.dims": [64, 64],
    "model.feature_vector_size": 32,
    "model.ray_tracer.n_steps": 32,
    "model.ray_tracer.sphere_tracing_iters": 5,
    "train.num_pixels": 64,
}


@pytest.fixture(scope="module")
def dummy_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    generate_dummy_scene(str(root / "dummy" / "scan0"), n_views=4, image_size=32,
                         focal=35.0)
    return str(root)


def small_conf(name="dummy.conf"):
    conf = hocon.parse_file(os.path.join(CONF_DIR, name))
    for k, v in SMALL_MODEL_PATCH.items():
        conf.put(k, v)
    conf.put("dataset.img_res", [32, 32])
    return conf


def test_dataset_loads(dummy_scene):
    ds = SceneDataset(False, data_dir="dummy", img_res=[32, 32], scan_id=0,
                      data_root=dummy_scene)
    assert len(ds) == 4
    assert ds.rgb_images.shape == (4, 32 * 32, 3)
    assert ds.object_masks.any() and not ds.object_masks.all()
    # camera check: rays through masked pixels must hit the unit sphere
    sample, gt = ds.full_image_inputs(0)
    from hashmodnffbanks_idr_tpu.geometry.cameras import (
        get_camera_params, get_sphere_intersection)
    dirs, loc = get_camera_params(
        jnp.asarray(sample["uv"]), jnp.asarray(sample["pose"]),
        jnp.asarray(sample["intrinsics"]))
    _, hit = get_sphere_intersection(loc, dirs, r=1.0)
    hit = np.asarray(hit).reshape(-1)
    mask = sample["object_mask"].reshape(-1)
    assert hit[mask].mean() > 0.95  # object pixels' rays hit the unit sphere


def test_renderer_forward(dummy_scene):
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork

    conf = small_conf()
    model = IDRNetwork(conf.get_config("model"))
    params = model.init(jax.random.PRNGKey(0))
    ds = SceneDataset(False, data_dir="dummy", img_res=[32, 32], scan_id=0,
                      data_root=dummy_scene)
    sample, gt = ds.full_image_inputs(0)
    # subsample rays for speed
    sel = np.random.default_rng(0).choice(32 * 32, 128, replace=False)
    inputs = {
        "uv": jnp.asarray(sample["uv"][:, sel]),
        "intrinsics": jnp.asarray(sample["intrinsics"]),
        "pose": jnp.asarray(sample["pose"]),
        "object_mask": jnp.asarray(sample["object_mask"][:, sel]),
    }
    out = model.apply(params, inputs, jax.random.PRNGKey(1), training=True)
    assert out["rgb_values"].shape == (128, 3)
    assert out["sdf_output"].shape == (128, 1)
    assert out["grad_theta"].shape == (128 + 64, 3)
    for k in ("rgb_values", "sdf_output", "grad_theta"):
        assert np.isfinite(np.asarray(out[k])).all(), k

    out_eval = model.apply(params, inputs, jax.random.PRNGKey(1), training=False)
    assert "grad_theta" not in out_eval


def test_train_steps_reduce_loss(dummy_scene, tmp_path):
    from hashmodnffbanks_idr_tpu.train.trainer import IDRTrainRunner

    conf = small_conf()
    runner = IDRTrainRunner(
        conf=conf, nepochs=3, exps_folder_name=str(tmp_path / "exps"),
        data_root=dummy_scene, log_tensorboard=False,
    )
    state = runner.run()
    flat, _ = jax.tree_util.tree_flatten(state["params"])
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # loss logged
    log = os.path.join(runner.rundir, "logs", "scalars.jsonl")
    assert os.path.exists(log)
    lines = open(log).read().strip().splitlines()
    assert len(lines) >= 3


def test_train_step_trainable_cameras(dummy_scene, tmp_path):
    from hashmodnffbanks_idr_tpu.train.trainer import IDRTrainRunner

    conf = small_conf()
    conf.put("train.learning_rate_cam", 1.0e-4)
    runner = IDRTrainRunner(
        conf=conf, nepochs=1, exps_folder_name=str(tmp_path / "exps"),
        data_root=dummy_scene, train_cameras=True, log_tensorboard=False,
    )
    pose0 = np.asarray(runner.state["pose_vecs"]).copy()
    state = runner.run()
    pose1 = np.asarray(state["pose_vecs"])
    assert np.isfinite(pose1).all()
    assert not np.allclose(pose0, pose1)  # poses actually moved


def test_checkpoint_resume(dummy_scene, tmp_path):
    from hashmodnffbanks_idr_tpu.train.trainer import IDRTrainRunner

    conf = small_conf()
    exps = str(tmp_path / "exps")
    r1 = IDRTrainRunner(conf=conf, nepochs=1, exps_folder_name=exps,
                        data_root=dummy_scene, log_tensorboard=False)
    r1.run()
    r2 = IDRTrainRunner(conf=conf, nepochs=2, exps_folder_name=exps,
                        data_root=dummy_scene, is_continue=True,
                        log_tensorboard=False)
    assert r2.start_epoch == 1
    p1 = jax.tree_util.tree_leaves(r1.state["params"])
    p2 = jax.tree_util.tree_leaves(r2.state["params"])
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
