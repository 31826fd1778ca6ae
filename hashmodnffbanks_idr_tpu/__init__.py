"""hashmodnffbanks_idr_tpu — a TPU-native neural surface reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo ArtoriasAbyssslayer/HashModNFFBanks-IDR (Implicit Differentiable Rendering
with multi-resolution hash-grid / Neural Fourier Filter Bank / style-modulated
input encodings), built TPU-first:

  * static-shape masked sphere tracing (`lax.while_loop`) instead of boolean
    gather/scatter choreography,
  * a single offset-table multi-resolution hash grid op (gather + segment-sum
    scatter; fully twice-differentiable for the eikonal term) with an optional
    Pallas fast path,
  * MXU-aligned fused MLPs for the SDF / rendering networks,
  * ray sharding + hash-table sharding over a `jax.sharding.Mesh` in place of
    the reference's single-GPU chunking.

Layer map mirrors SURVEY.md: config -> geometry -> ops -> models -> train/eval.
"""

__version__ = "0.1.0"
