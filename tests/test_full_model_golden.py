"""Full-model golden: reference IDRNetwork checkpoint -> our renderer.

VERDICT round-1 item 3: whole-pipeline parity (tracer handoffs + renderer
composition) proven, not inferred.  The reference's committed trained_models
contain ONLY CamParameters (verified: `find trained_models -name '*.pth'`
lists 13 CamParameters files and no ModelParameters), so the model-weight
leg instantiates the reference's own IDRNetwork (geometric init = sphere
SDF, rays genuinely intersect), saves a checkpoint with the reference's own
format (idr_train.py:182-185), imports it through train/torch_import.py and
requires:

  * eval-branch render parity: points / dists / network_object_mask / rgb
    allclose on a 24x24 ray grid (eval.py:150-159 path),
  * train-branch pixel-GRADIENT parity: d(sum of surface rgb)/d(weights)
    allclose for the first implicit + rendering linears,
  * CamParameters import from the reference's real trained_models files.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

for _mod in ("imageio", "skimage"):
    if _mod not in sys.modules:
        try:
            __import__(_mod)
        except ImportError:
            sys.modules[_mod] = types.ModuleType(_mod)
if "tinycudann" not in sys.modules:
    _tcnn = types.ModuleType("tinycudann")
    _tcnn.Encoding = object
    sys.modules["tinycudann"] = _tcnn

# the reference hardcodes .cuda() in IDRNetwork.forward (impl..._renderer.py
# :279,306); make it a no-op so the math runs on CPU
torch.Tensor.cuda = lambda self, *a, **k: self

import jax
import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.config.hocon import Config, parse_string
from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork as OursIDR
from hashmodnffbanks_idr_tpu.train import torch_import as ti


class _ConfShim:
    """Just enough of the pyhocon ConfigTree API for the reference model."""

    def __init__(self, data):
        self.data = data

    def get_int(self, key):
        return int(self._get(key))

    def get_float(self, key):
        return float(self._get(key))

    def get_config(self, key):
        v = self._get(key)
        return v  # dicts are **-unpackable; IDRNetwork only needs that + None

    def _get(self, key):
        cur = self.data
        for part in key.split("."):
            if cur is None or part not in cur:
                return None
            cur = cur[part]
        return cur


MODEL_CONF = """
model {
    feature_vector_size = 8
    tracer_fast = False
    implicit_network {
        d_in = 3
        d_out = 1
        dims = [32, 32, 32, 32, 32, 32]
        geometric_init = True
        bias = 0.6
        skip_in = [4]
        weight_norm = True
        multires = 0
    }
    rendering_network {
        mode = idr
        d_in = 9
        d_out = 3
        viewdirs_embed_type = NerfPos
        dims = [32, 32]
        weight_norm = True
        multires_view = 2
    }
    ray_tracer {
        object_bounding_sphere = 1.0
        sdf_threshold = 5.0e-5
        line_search_step = 0.5
        line_step_iters = 3
        sphere_tracing_iters = 10
        n_steps = 100
        n_secant_steps = 8
    }
}
"""


def _build_pair(tmp_path, seed=0):
    from model.implicit_differentiable_renderer import IDRNetwork as RefIDR

    conf = Config(parse_string(MODEL_CONF))
    ref_conf = _ConfShim({
        "feature_vector_size": 8,
        "embedding_network": None,
        "implicit_network": dict(conf.get_config("model.implicit_network").data),
        "rendering_network": dict(conf.get_config("model.rendering_network").data),
        "ray_tracer": dict(conf.get_config("model.ray_tracer").data),
    })
    torch.manual_seed(seed)
    ref = RefIDR(ref_conf)

    # save with the reference's own checkpoint format (idr_train.py:182-185)
    path = os.path.join(tmp_path, "2000.pth")
    torch.save({"epoch": 2000, "model_state_dict": ref.state_dict()}, path)

    ours = OursIDR(conf.get_config("model"))
    params = ours.init(jax.random.PRNGKey(0))
    params = ti.import_checkpoint(path, ours, params)
    return ref, ours, params


def _camera_inputs(n=24):
    """One camera at z=+2 looking at the origin; n x n pixel grid."""
    uv = np.stack(np.meshgrid(np.arange(n, dtype=np.float32),
                              np.arange(n, dtype=np.float32)), -1).reshape(1, n * n, 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)
    pose[2, 3] = 2.0
    intr = np.diag([2.5 * n, 2.5 * n, 1.0, 1.0]).astype(np.float32)
    intr[0, 2] = n / 2
    intr[1, 2] = n / 2
    rng = np.random.default_rng(3)
    mask = rng.uniform(size=(1, n * n)) > 0.3
    return {"uv": uv, "pose": pose[None], "intrinsics": intr[None],
            "object_mask": mask}


def test_eval_render_parity(tmp_path):
    ref, ours, params = _build_pair(str(tmp_path))
    inp = _camera_inputs()

    ref.eval()
    # no torch.no_grad(): implicit_network.gradient needs autograd even in
    # eval (the reference's eval.py renders the same way); detach below
    out_ref = ref({k: torch.from_numpy(np.asarray(v)) for k, v in inp.items()})
    out_ref = {k: (v.detach() if hasattr(v, "detach") else v)
               for k, v in out_ref.items()}

    jinp = {k: jnp.asarray(v) for k, v in inp.items()}
    out = ours.apply(params, jinp, jax.random.PRNGKey(1), training=False)

    want_mask = out_ref["network_object_mask"].numpy().astype(bool)
    got_mask = np.asarray(out["network_object_mask"]).astype(bool)
    # fp noise can flip convergence of individual grazing rays; demand
    # near-perfect agreement and compare values on the intersection
    assert (want_mask != got_mask).mean() < 0.01, (want_mask.sum(), got_mask.sum())
    both = want_mask & got_mask
    assert both.sum() > 50  # the sphere actually fills the crop

    want_pts = out_ref["points"].numpy()
    got_pts = np.asarray(out["points"])
    np.testing.assert_allclose(got_pts[both], want_pts[both], rtol=0, atol=2e-4)

    want_rgb = out_ref["rgb_values"].numpy()
    got_rgb = np.asarray(out["rgb_values"])
    np.testing.assert_allclose(got_rgb[both], want_rgb[both], rtol=0, atol=2e-4)

    want_sdf = out_ref["sdf_output"].numpy().reshape(-1)
    got_sdf = np.asarray(out["sdf_output"]).reshape(-1)
    np.testing.assert_allclose(got_sdf[both], want_sdf[both], rtol=0, atol=2e-5)


def test_train_pixel_gradient_parity(tmp_path):
    ref, ours, params = _build_pair(str(tmp_path), seed=4)
    inp = _camera_inputs()
    tin = {k: torch.from_numpy(np.asarray(v)) for k, v in inp.items()}

    ref.train()
    out_ref = ref(tin)
    surf_ref = (out_ref["network_object_mask"] & out_ref["object_mask"]).numpy()

    jinp = {k: jnp.asarray(v) for k, v in inp.items()}

    def loss_fn(p):
        out = ours.apply(p, jinp, jax.random.PRNGKey(1), training=True)
        surf = out["network_object_mask"] & jinp["object_mask"].reshape(-1)
        return jnp.sum(jnp.where(surf[:, None], out["rgb_values"], 0.0)), surf

    (loss, surf), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    surf = np.asarray(surf)
    assert (surf != surf_ref).mean() < 0.01

    both = surf & surf_ref
    # compare gradients restricted to an identical pixel set: rerun both
    # losses over `both` (deterministic: rgb at converged surface points)
    ref.zero_grad()
    out_ref = ref(tin)
    out_ref["rgb_values"][torch.from_numpy(both)].sum().backward()

    def loss_fn2(p):
        out = ours.apply(p, jinp, jax.random.PRNGKey(1), training=True)
        return jnp.sum(jnp.where(jnp.asarray(both)[:, None], out["rgb_values"], 0.0))

    grads = jax.grad(loss_fn2)(params)

    g_ref = ref.implicit_network.lin0.weight_v.grad.numpy().T
    g_got = np.asarray(grads["implicit_network"]["lin"][0]["v"])
    np.testing.assert_allclose(g_got, g_ref, rtol=0, atol=5e-4)

    r_ref = ref.rendering_network.lin0.weight_v.grad.numpy().T
    r_got = np.asarray(grads["rendering_network"]["lin"][0]["v"])
    np.testing.assert_allclose(r_got, r_ref, rtol=0, atol=5e-4)


def test_cam_parameters_import_real_checkpoint():
    path = ("/root/reference/trained_models/original_idr/"
            "dtu_trained_cameras_65/2020/checkpoints/CamParameters/2000.pth")
    if not os.path.exists(path):
        pytest.skip("reference CamParameters checkpoint not present")
    sd = ti.load_pth(path)
    vecs = ti.import_pose_vecs(sd)
    assert vecs.shape == (49, 7)
    # quaternion part of a trained pose vector stays near unit norm
    qn = np.linalg.norm(np.asarray(vecs[:, :4]), axis=-1)
    assert np.all(qn > 0.5) and np.all(qn < 2.0)
    assert np.isfinite(np.asarray(vecs)).all()
