"""End-to-end coverage for the appearance-transfer (disentanglement) path.

VERDICT round-1 item 9: the reference's eval_disentanglement.py:72-163 loads
a geometry checkpoint and an appearance checkpoint, swaps the rendering
network, and renders a spline camera orbit with empty masks. Here: two
parameter sets with distinct rendering networks stand in for the two
checkpoints; we render a short orbit through `render_disentangled` (the same
code the CLI drives) and assert the frames are finite, non-trivial, and that
the swapped appearance actually changes the output.
"""

import glob
import os

import numpy as np
import jax
import pytest

from hashmodnffbanks_idr_tpu.config import hocon
from hashmodnffbanks_idr_tpu.data.dummy import generate_dummy_scene
from hashmodnffbanks_idr_tpu.eval.disentanglement import (
    render_disentangled, spline_camera_orbit, swap_appearance)

CONF_DIR = os.path.join(os.path.dirname(__file__), "..",
                        "hashmodnffbanks_idr_tpu", "config", "confs")

SMALL_MODEL_PATCH = {
    "model.implicit_network.dims": [64, 64, 64, 64, 64, 64],
    "model.rendering_network.dims": [64, 64],
    "model.feature_vector_size": 32,
    "model.ray_tracer.n_steps": 32,
    "model.ray_tracer.sphere_tracing_iters": 5,
}


@pytest.fixture(scope="module")
def dummy_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    generate_dummy_scene(str(root / "dummy" / "scan0"), n_views=4,
                         image_size=24, focal=26.0)
    return str(root)


def _conf():
    conf = hocon.parse_file(os.path.join(CONF_DIR, "dummy.conf"))
    for k, v in SMALL_MODEL_PATCH.items():
        conf.put(k, v)
    conf.put("dataset.img_res", [24, 24])
    return conf


def test_spline_orbit_shapes():
    # orbit through 4 synthetic look-at poses stays a valid rigid transform
    from hashmodnffbanks_idr_tpu.data.dummy import _look_at

    poses = []
    for phi in np.linspace(0, 1.5 * np.pi, 4):
        pos = 2.0 * np.array([np.cos(phi), 0.3, np.sin(phi)])
        R = _look_at(pos)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = R.T  # camera-to-world
        P[:3, 3] = pos
        poses.append(P)
    orbit = spline_camera_orbit(np.stack(poses), n_frames=7)
    assert orbit.shape == (7, 4, 4)
    # rotations orthonormal after quaternion-spline round trip
    RtR = np.einsum("nij,nik->njk", orbit[:, :3, :3], orbit[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (7, 1, 1)), atol=2e-2)


def test_render_disentangled_end_to_end(dummy_scene, tmp_path):
    conf = _conf()
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork

    model = IDRNetwork(conf.get_config("model"))
    params_geo = model.init(jax.random.PRNGKey(0))
    params_app = model.init(jax.random.PRNGKey(7))

    swapped = swap_appearance(params_geo, params_app)
    # geometry params untouched, rendering params replaced
    g0 = jax.tree_util.tree_leaves(params_geo["implicit_network"])[0]
    s0 = jax.tree_util.tree_leaves(swapped["implicit_network"])[0]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(s0))
    r_app = jax.tree_util.tree_leaves(params_app["rendering_network"])[0]
    r_sw = jax.tree_util.tree_leaves(swapped["rendering_network"])[0]
    np.testing.assert_array_equal(np.asarray(r_app), np.asarray(r_sw))

    out_swap = str(tmp_path / "swap")
    render_disentangled(conf, params_geo, params_app, out_swap, n_frames=3,
                        data_root=dummy_scene, scan_id=0)
    frames = sorted(glob.glob(os.path.join(out_swap, "frame_*.png")))
    assert len(frames) == 3

    import cv2

    imgs = [cv2.imread(f) for f in frames]
    for im in imgs:
        assert im is not None and im.shape == (24, 24, 3)
        assert np.isfinite(im.astype(np.float64)).all()

    # identity "swap" (appearance == geometry) must differ from the real swap:
    # the rendering network actually drives the output
    out_id = str(tmp_path / "identity")
    render_disentangled(conf, params_geo, params_geo, out_id, n_frames=3,
                        data_root=dummy_scene, scan_id=0)
    id_frames = sorted(glob.glob(os.path.join(out_id, "frame_*.png")))
    diffs = [np.abs(cv2.imread(a).astype(np.int32) - cv2.imread(b).astype(np.int32)).max()
             for a, b in zip(frames, id_frames)]
    assert max(diffs) > 2, f"swapped appearance did not change renders: {diffs}"
