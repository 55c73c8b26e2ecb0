"""One-off extended fuzz sweep: run the suite's four-path equivalence
property over FRESH seeds (beyond the pinned 0-7), for the validation
record. Usage: python scripts/fuzz_sweep.py [start] [count]."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

start = int(sys.argv[1]) if len(sys.argv) > 1 else 100
count = int(sys.argv[2]) if len(sys.argv) > 2 else 12

import pytest

from test_fuzz_equivalence import test_fused_pernode_compiler_equivalence

ok = 0
for seed in range(start, start + count):
    try:
        test_fused_pernode_compiler_equivalence(seed)
        ok += 1
        print(f"seed {seed}: PASS", flush=True)
    except pytest.skip.Exception:
        print(f"seed {seed}: degenerate graph, skipped", flush=True)
    except Exception as e:  # noqa: BLE001 — report and stop
        print(f"seed {seed}: FAIL {e}", flush=True)
        raise
print(f"SWEEP PASS: {ok}/{count} fresh seeds (four-path bit equivalence)")
