"""Golden parity tests against the reference implementation (torch CPU).

These construct the reference's own modules (mounted read-only at
/root/reference), copy their weights into our param pytrees, and require
allclose outputs.  Skipped when the reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

# the reference's utils.rend_util imports imageio/skimage at module scope;
# only camera math is exercised here, so stub them if absent.
import types

for _mod in ("imageio", "skimage"):
    if _mod not in sys.modules:
        try:
            __import__(_mod)
        except ImportError:
            sys.modules[_mod] = types.ModuleType(_mod)

if "tinycudann" not in sys.modules:
    try:
        import tinycudann  # noqa: F401
    except ImportError:
        _tcnn = types.ModuleType("tinycudann")
        _tcnn.Encoding = object  # constructor never reached in these tests
        sys.modules["tinycudann"] = _tcnn

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# frequency encodings
# ---------------------------------------------------------------------------

def test_positional_encoding_matches():
    from model.embeddings.frequency_enc import PositionalEncoding

    from hashmodnffbanks_idr_tpu.ops.encodings import positional_encoding

    ref = PositionalEncoding(include_input=True, input_dims=3, max_freq_log2=5,
                             num_freqs=16, log_sampling=True,
                             periodic_fns=[torch.sin, torch.cos])
    x = np.random.default_rng(0).uniform(-1, 1, (7, 3)).astype(np.float32)
    want = ref.embed(torch.from_numpy(x)).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(x), num_freqs=16,
                                         max_freq_log2=5, include_input=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_positional_encoding_mismatched_dims_matches():
    """The NFFB per-level case: declared input_dims=2, actual input dim 4."""
    from model.embeddings.frequency_enc import PositionalEncoding

    from hashmodnffbanks_idr_tpu.ops.encodings import positional_encoding

    ref = PositionalEncoding(include_input=True, input_dims=2, max_freq_log2=5,
                             num_freqs=6, log_sampling=True,
                             periodic_fns=[torch.sin, torch.cos])
    x = np.random.default_rng(1).uniform(-1, 1, (5, 4)).astype(np.float32)
    want = ref.embed(torch.from_numpy(x)).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(x), num_freqs=6,
                                         max_freq_log2=5, include_input=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fourier_features_matches():
    from model.embeddings.frequency_enc import FourierFeature

    from hashmodnffbanks_idr_tpu.ops.encodings import fourier_features

    ref = FourierFeature(input_dims=3, sigma=1.0, num_channels=8, include_input=True)
    B = ref.B.numpy()
    x = np.random.default_rng(2).uniform(-1, 1, (6, 3)).astype(np.float32)
    want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(fourier_features(jnp.asarray(x), jnp.asarray(B), True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spherical_harmonics_matches():
    from model.embeddings.frequency_enc import SHEncoder

    from hashmodnffbanks_idr_tpu.ops.encodings import spherical_harmonics

    ref = SHEncoder(3, degree=4)
    d = np.random.default_rng(3).normal(size=(9, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    want = ref(torch.from_numpy(d)).numpy()
    got = np.asarray(spherical_harmonics(jnp.asarray(d), degree=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# hash function + pure-torch hash grid
# ---------------------------------------------------------------------------

def test_hash_func_matches():
    import model.embeddings.hashGridEmbedding as hge

    from hashmodnffbanks_idr_tpu.ops.hashgrid import TORCH_PRIMES, _hash_u32

    idx = np.random.default_rng(4).integers(0, 1 << 12, (32, 3))
    primes_t = torch.tensor(list(hge.HASH_PRIMES))
    want = hge.hash_func(torch.from_numpy(idx.copy()), primes_t, 1 << 7).numpy()
    got = np.asarray(_hash_u32(jnp.asarray(idx, dtype=jnp.int32), TORCH_PRIMES)) % (1 << 7)
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_torch_hashgrid_full_forward_matches():
    from model.embeddings.hashGridEmbedding import MultiResHashGridMLP

    from hashmodnffbanks_idr_tpu.models.embedders import HashGridTorchEmbedder

    ref = MultiResHashGridMLP(include_input=True, in_dim=3, n_levels=4,
                              max_points_per_level=2, log2_hashmap_size=5,
                              base_resolution=4, desired_resolution=32)
    ours = HashGridTorchEmbedder(include_input=True, in_dim=3, n_levels=4,
                                 max_points_per_level=2, log2_hashmap_size=5,
                                 base_resolution=4, desired_resolution=32,
                                 interpolation="floor")
    params = ours.init(jax.random.PRNGKey(0))
    # copy reference level tables into our packed table + B buffer
    offs = ours.spec.offsets()
    table = np.asarray(params["table"]).copy()
    for l, level in enumerate(ref.levels):
        w = level.embedding.weight.detach().numpy()
        table[offs[l]:offs[l] + len(w)] = w
    params["table"] = jnp.asarray(table)
    params["ff"]["B"] = jnp.asarray(ref.freq_encoding.B.numpy())

    x = np.random.default_rng(5).uniform(0, 1, (11, 3)).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# SDF network end-to-end (no encoder)
# ---------------------------------------------------------------------------

def _copy_linear(t_lin, p):
    """torch weight-norm Linear -> our {'v','g','b'} (kernel transposed)."""
    out = {}
    if "v" in p:
        out["v"] = jnp.asarray(t_lin.weight_v.detach().numpy().T)
        out["g"] = jnp.asarray(t_lin.weight_g.detach().numpy().reshape(-1))
        out["b"] = jnp.asarray(t_lin.bias.detach().numpy())
    else:
        out["w"] = jnp.asarray(t_lin.weight.detach().numpy().T)
        out["b"] = jnp.asarray(t_lin.bias.detach().numpy())
    return out


def test_implicit_network_matches():
    from model.implicit_differentiable_renderer import ImplicitNetwork

    from hashmodnffbanks_idr_tpu.models.networks import ImplicitNetwork as Ours

    torch.manual_seed(0)
    ref = ImplicitNetwork(feature_vector_size=8, d_in=3, d_out=1,
                          dims=[32, 32, 32, 32, 32, 32], geometric_init=True,
                          bias=0.6, skip_in=[4], weight_norm=True, multires=0)
    ours = Ours(feature_vector_size=8, d_in=3, d_out=1,
                dims=[32, 32, 32, 32, 32, 32], geometric_init=True, bias=0.6,
                skip_in=[4], weight_norm=True, multires=0)
    params = ours.init(jax.random.PRNGKey(0))
    for l in range(ours.num_layers - 1):
        params["lin"][l] = _copy_linear(getattr(ref, f"lin{l}"), params["lin"][l])
    params["density"]["beta"] = jnp.asarray(float(ref.dencity_net.beta.detach()))

    x = np.random.default_rng(6).uniform(-0.8, 0.8, (13, 3)).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_rendering_network_matches():
    from model.implicit_differentiable_renderer import RenderingNetwork

    from hashmodnffbanks_idr_tpu.models.networks import RenderingNetwork as Ours

    torch.manual_seed(1)
    ref = RenderingNetwork(feature_vector_size=8, mode="idr", d_in=9, d_out=3,
                           dims=[32, 32], weight_norm=True, multires_view=4,
                           viewdirs_embed_type="NerfPos")
    ours = Ours(feature_vector_size=8, mode="idr", d_in=9, d_out=3,
                dims=[32, 32], weight_norm=True, multires_view=4,
                viewdirs_embed_type="NerfPos")
    params = ours.init(jax.random.PRNGKey(0))
    for l in range(ours.num_layers - 1):
        params["lin"][l] = _copy_linear(getattr(ref, f"lin{l}"), params["lin"][l])

    rng = np.random.default_rng(7)
    pts = rng.uniform(-0.5, 0.5, (5, 3)).astype(np.float32)
    nrm = rng.normal(size=(5, 3)).astype(np.float32)
    vd = rng.normal(size=(5, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    fv = rng.normal(size=(5, 8)).astype(np.float32)
    want = ref(torch.from_numpy(pts), torch.from_numpy(nrm),
               torch.from_numpy(vd), torch.from_numpy(fv)).detach().numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(pts), jnp.asarray(nrm),
                                jnp.asarray(vd), jnp.asarray(fv)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# NFFB (FourierFilterBanks) full forward
# ---------------------------------------------------------------------------

def test_nffb_full_forward_matches():
    from model.embeddings.nffb3d import FourierFilterBanks

    from hashmodnffbanks_idr_tpu.models.embedders import NFFBEmbedder

    torch.manual_seed(2)
    cfg = {
        "include_input": True, "in_dim": 3, "embed_type": "HashGridTcnn",
        "network_dims": [3, 32, 32, 9], "n_levels": 4, "max_points_per_level": 2,
        "log2_hashmap_size": 5, "base_resolution": 4, "desired_resolution": 32,
        "base_sigma": 10.0, "exp_sigma": 1.26, "grid_embedding_std": 0.001,
        "per_level_scale": 2.0,
    }
    ref = FourierFilterBanks(cfg, freq_enc_type="PositionalEncodingNET",
                             has_out=False, bound=0.45, layers_type="SIREN",
                             style_modulation=True)
    ours = NFFBEmbedder(in_dim=3, n_levels=4, max_points_per_level=2,
                        log2_hashmap_size=5, base_resolution=4,
                        desired_resolution=32, bound=0.45,
                        freq_enc_type="PositionalEncodingNET",
                        layers_type="SIREN", style_modulation=True,
                        has_out=False, include_input=True, grid_backend="torch")
    assert ours.embeddings_dim == ref.embeddings_dim

    params = ours.init(jax.random.PRNGKey(0))
    # grid tables + fourier aux
    offs = ours.grid.spec.offsets()
    table = np.asarray(params["grid"]["table"]).copy()
    for l, level in enumerate(ref.grid_enc.levels):
        w = level.embedding.weight.detach().numpy()
        table[offs[l]:offs[l] + len(w)] = w
    params["grid"]["table"] = jnp.asarray(table)
    params["grid"]["ff"]["B"] = jnp.asarray(ref.grid_enc.freq_encoding.B.numpy())
    # trunk linears
    for l in range(ours.n_nffb_layers - 1):
        t = getattr(ref, f"ff_lin{l}")
        params["ff_lin"][l] = {"w": jnp.asarray(t.weight.detach().numpy().T),
                               "b": jnp.asarray(t.bias.detach().numpy())}
    params["out_layer"] = {"w": jnp.asarray(ref.out_layer.weight.detach().numpy().T),
                           "b": jnp.asarray(ref.out_layer.bias.detach().numpy())}
    params["style"]["linear_transform"] = {
        "w": jnp.asarray(ref.StyleAttentionBlock.linear_transform.weight.detach().numpy().T),
        "b": jnp.asarray(ref.StyleAttentionBlock.linear_transform.bias.detach().numpy()),
    }
    params["style"]["attention"] = {
        "w": jnp.asarray(ref.StyleAttentionBlock.attention.weight.detach().numpy().T),
        "b": jnp.asarray(ref.StyleAttentionBlock.attention.bias.detach().numpy()),
    }

    x = np.random.default_rng(8).uniform(-0.4, 0.4, (10, 3)).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# sample network + loss pieces
# ---------------------------------------------------------------------------

def test_sample_network_matches():
    from model.sample_network import SampleNetwork

    from hashmodnffbanks_idr_tpu.models.sample_network import sample_network

    rng = np.random.default_rng(9)
    n = 6
    so = rng.normal(size=(n, 1)).astype(np.float32) * 0.1
    sv = rng.normal(size=(n, 1)).astype(np.float32) * 0.1
    g = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.uniform(1, 3, (n, 1)).astype(np.float32)
    c = rng.normal(size=(n, 3)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)

    ref = SampleNetwork()
    want = ref(torch.from_numpy(so), torch.from_numpy(sv), torch.from_numpy(g),
               torch.from_numpy(d), torch.from_numpy(c), torch.from_numpy(v)).numpy()
    got = np.asarray(sample_network(jnp.asarray(so), jnp.asarray(sv),
                                    jnp.asarray(g), jnp.asarray(d),
                                    jnp.asarray(c), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_laplace_density_matches():
    from model.density_net import LaplaceDensity

    from hashmodnffbanks_idr_tpu.models.networks import LaplaceDensity as Ours

    ref = LaplaceDensity(params_init={"beta": 0.9})
    ours = Ours(beta_init=0.9)
    p = ours.init()
    x = np.linspace(-2, 2, 21).astype(np.float32)
    want = ref.density_func(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
