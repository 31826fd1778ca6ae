import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.ops.style import (adaptive_instance_normalization,
                                               coral, gram_matrix, style_loss)


def test_adain_transfers_stats():
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.normal(0, 1, (2, 4, 50)).astype(np.float32))
    style = jnp.asarray(rng.normal(3, 2, (2, 4, 50)).astype(np.float32))
    out = np.asarray(adaptive_instance_normalization(content, style))
    np.testing.assert_allclose(out.mean(-1), np.asarray(style).mean(-1), atol=0.2)
    np.testing.assert_allclose(out.std(-1), np.asarray(style).std(-1), rtol=0.2)


def test_adain_matches_reference():
    import os, sys, types

    if not os.path.isdir("/root/reference/code"):
        pytest.skip("no reference")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/code")
    from model.embeddings.style_Attention.style_function import (
        adaptive_instance_normalization as ref_adain)

    rng = np.random.default_rng(1)
    c = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    s = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    want = ref_adain(torch.from_numpy(c), torch.from_numpy(s)).numpy()
    got = np.asarray(adaptive_instance_normalization(jnp.asarray(c), jnp.asarray(s)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_coral_matches_target_covariance():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(0, 1, (4, 500)).astype(np.float32))
    A = rng.normal(size=(4, 4)).astype(np.float32)
    tgt = jnp.asarray(A @ rng.normal(0, 1, (4, 500)).astype(np.float32) + 2.0)
    out = np.asarray(coral(src, tgt))
    cov_out = np.cov(out)
    cov_tgt = np.cov(np.asarray(tgt))
    np.testing.assert_allclose(cov_out, cov_tgt, rtol=0.3, atol=0.3)


def test_gram_and_style_loss():
    f = jnp.asarray(np.eye(4, 10, dtype=np.float32))
    g = np.asarray(gram_matrix(f))
    assert g.shape == (4, 4)
    assert float(style_loss(f, f)) == 0.0
    assert float(style_loss(f, f * 2)) > 0.0


def test_decoder_pretrain_sphere():
    from hashmodnffbanks_idr_tpu.models.decoder import Decoder, pre_train_sphere

    dec = Decoder(3, [32, 32], 1)
    params = dec.init(jax.random.PRNGKey(0))
    params, loss = pre_train_sphere(dec, params, jax.random.PRNGKey(1),
                                    iters=300, radius=0.3, lr=1e-3)
    assert loss < 0.01
    # decoder now approximates the sphere SDF sign
    pts_in = jnp.asarray([[0.0, 0.0, 0.0]])
    pts_out = jnp.asarray([[0.45, 0.0, 0.0]])
    assert float(dec.apply(params, pts_in)[0, 0]) < 0
    assert float(dec.apply(params, pts_out)[0, 0]) > 0
