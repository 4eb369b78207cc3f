"""Go/no-go timing for the fused IAF flow-stack Pallas kernel
(ops/flow_kernel.py) vs the XLA conv path at the student's real shape —
one 10-layer flow, num_stages 10 (dilations 1..512), width 64.

docs/student_kernel_plan.md sets the bar: the kernel must beat the XLA
path by >= 2x on device-ish time to justify the full integration
(4 flows + out heads + parallelgen wiring) in round 4.

Usage: python benchmarks/ab_flow_kernel.py [B] [L] [tile] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.ops import flow_kernel as fk
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 64000
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    NL, stages, W = 10, 10, 64
    L = L // tile * tile

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, W).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.randn(B, L, NL * W).astype(np.float32) * 0.1)
    w_tap = jnp.asarray(rng.randn(NL, 3, W, W).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(NL, W).astype(np.float32) * 0.05)
    w_res = jnp.asarray(rng.randn(NL, W // 2, W).astype(np.float32) * 0.1)
    b_res = jnp.asarray(rng.randn(NL, W).astype(np.float32) * 0.05)

    # compact: bf16 cond stream + bf16 weight storage (carries stay f32 —
    # the documented Mosaic bf16-carry miscompile, see make_flow_stack_fn);
    # the all-f32 variant exceeds VMEM at the full dilation ladder
    pallas_fn = fk.make_flow_stack_fn(NL, stages, W, B, L, tile=tile,
                                      compact=True)
    fns = {}
    for name, f in (
        ("xla_conv", lambda *a: fk.flow_stack_reference(*a, num_stages=stages)),
        ("pallas", pallas_fn),
    ):
        jf = jax.jit(lambda *a, f=f: jnp.mean(jnp.abs(f(*a))))
        t0 = time.time()
        try:
            out = float(np.asarray(jf(x, cond, w_tap, b, w_res, b_res)))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return 1
        print(f"{name}: compile+first {time.time() - t0:.1f}s (witness {out:.4f})",
              file=sys.stderr)
        fns[name] = (jf, [])

    # parity at full shape on hardware
    a = np.asarray(jax.jit(pallas_fn)(x, cond, w_tap, b, w_res, b_res))
    bref = np.asarray(jax.jit(
        lambda *z: fk.flow_stack_reference(*z, num_stages=stages)
    )(x, cond, w_tap, b, w_res, b_res))
    err = np.abs(a - bref).max() / max(np.abs(bref).max(), 1e-6)
    print(f"parity: rel max err {err:.5f}")

    for rep in range(reps):
        for name, (jf, times) in fns.items():
            t0 = time.time()
            np.asarray(jf(x, cond, w_tap, b, w_res, b_res))
            times.append(time.time() - t0)
    meds = {}
    for name, (jf, times) in fns.items():
        meds[name] = float(np.median(times))
        print(f"{name}: median {meds[name] * 1e3:.1f} ms "
              f"(spread {min(times) * 1e3:.0f}-{max(times) * 1e3:.0f})")
    print(f"pallas speedup: {meds['xla_conv'] / meds['pallas']:.2f}x "
          f"(go bar: >= 2x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
