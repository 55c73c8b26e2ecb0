"""Arithmetic precision notes and backend forcing helpers.

The reference's pixel math is scalar Rust f32: add/sub/mul/div are hardware
IEEE ops and `powf` is glibc's correctly-rounded implementation. Measured
facts for this rebuild (see tests/test_goldens.py):

- XLA **CPU**: f32 add/sub/mul/div are bit-identical to hardware IEEE, and
  f32 `pow` matches glibc `powf` exactly over the full u8/255 grid — so the
  CPU backend reproduces the reference bit-for-bit with *plain* ops.
- XLA **TPU**: add/sub/mul (and the resampler and u8 conversion) are
  bit-identical too, and TPU does NOT contract mul+add into FMAs (it
  matches numpy/Rust two-rounding semantics). Hardware `div` (reciprocal-
  multiply), `sqrt` (~1 ulp, ~40% of inputs), and `pow` (exp/log chain) are
  off, so `ops/exact_math.py` rebuilds them in double-single arithmetic:
  division and sqrt are correctly rounded (0 f32-bit mismatches vs glibc
  over exhaustive/2e6-point sweeps on a real v5e), and `ds_pow` is
  correctly rounded — differing from glibc only where glibc's powf
  (~0.82 ulp max error) itself misrounds, which u8 export quantization
  absorbs on the entire input grid. All 14 goldens are bit-exact on BOTH
  backends (`scripts/tpu_parity.py`).
- XLA **CPU** has the opposite hazard: LLVM contracts `a*b + c` into a
  single-rounding FMA where Rust (no fast-math) rounds twice.
  `exact_math.nc_mul` defeats the contraction (the product also feeds a
  Dekker error term, and strict FP rules keep `p + (err − err)` from being
  simplified). With it, HeightToNormal's f32 planes are bit-identical
  across CPU and TPU. One residual TPU caveat: denormals
  flush to zero (irrelevant for texture data in [0, 1]).

`force_cpu_backend()` must run before any other JAX usage — the hermetic
`JAX_PLATFORMS=cpu` env var is not honored when an out-of-tree TPU plugin
(e.g. the axon tunnel) registers itself, but the config update is.
"""

from __future__ import annotations


def force_cpu_backend() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")


def default_backend() -> str:
    import jax

    return jax.default_backend()
