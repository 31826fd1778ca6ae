"""SparseAdam camera-optimizer parity vs torch.optim.SparseAdam."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.train.trainer import (sparse_adam_init,
                                                   sparse_adam_update)


def test_sparse_adam_matches_torch():
    rng = np.random.default_rng(0)
    V = 5
    pose0 = rng.normal(size=(V, 7)).astype(np.float32)
    lr = 1e-3

    # torch reference: embedding with sparse grads
    emb = torch.nn.Embedding(V, 7, sparse=True)
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(pose0))
    opt = torch.optim.SparseAdam(emb.parameters(), lr=lr)

    # ours
    pose_j = jnp.asarray(pose0)
    state = sparse_adam_init(pose_j)

    # 6 steps touching different single rows, like batch_size=1 training
    rows = [0, 2, 2, 4, 1, 2]
    for step_i, r in enumerate(rows):
        g_full = rng.normal(size=(V, 7)).astype(np.float32)
        grad_rows = np.zeros_like(g_full)
        grad_rows[r] = g_full[r]

        idx = torch.tensor([r])
        out = emb(idx)
        opt.zero_grad()
        out.backward(torch.from_numpy(g_full[r:r + 1]))
        opt.step()

        pose_j, state = sparse_adam_update(
            pose_j, jnp.asarray(grad_rows), state,
            jnp.asarray([r], dtype=jnp.int32), lr)

    np.testing.assert_allclose(np.asarray(pose_j), emb.weight.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
