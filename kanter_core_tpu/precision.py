"""Arithmetic precision notes and backend forcing helpers.

The reference's pixel math is scalar Rust f32: add/sub/mul/div are hardware
IEEE ops and `powf` is glibc's correctly-rounded implementation. Measured
facts for this rebuild (see tests/test_goldens.py):

- XLA **CPU**: f32 add/sub/mul/div are bit-identical to hardware IEEE, and
  f32 `pow` matches glibc `powf` exactly over the full u8/255 grid — so the
  CPU backend reproduces the reference bit-for-bit with *plain* ops.
- XLA **TPU**: add/sub/mul (and the resampler, u8 conversion, and
  HeightToNormal chain) are bit-identical too. Hardware `div` (reciprocal-
  multiply) and `pow` (exp/log chain) are ~1 ulp off, so `ops/exact_math.py`
  rebuilds them in double-single arithmetic: division is correctly rounded
  (0/65536 grid + 0/1e6 wide-range f32-bit mismatches vs glibc on a real
  v5e), and `ds_pow` is correctly rounded — differing from glibc only where
  glibc's powf (~0.82 ulp max error) itself misrounds, which u8 export
  quantization absorbs on the entire input grid. All 14 goldens are
  bit-exact on BOTH backends (`scripts/tpu_parity.py`).

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
