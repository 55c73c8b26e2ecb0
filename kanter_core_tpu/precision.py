"""Arithmetic precision notes and backend forcing helpers.

The reference's pixel math is scalar Rust f32: add/sub/mul/div are hardware
IEEE ops and `powf` is glibc's correctly-rounded implementation. Measured
facts for this rebuild (see tests/test_goldens.py):

- XLA **CPU**: f32 add/sub/mul/div are bit-identical to hardware IEEE, and
  f32 `pow` matches glibc `powf` exactly over the full u8/255 grid — so the
  CPU backend reproduces the reference bit-for-bit with *plain* ops.
- XLA **TPU**: add/sub/mul (and the resampler, u8 conversion, and
  HeightToNormal chain) are bit-identical too; `div`/`pow` can differ by
  ~1 ulp from glibc (TPU transcendental/division implementations). Golden
  verification therefore runs on CPU; TPU keeps native speed.

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
