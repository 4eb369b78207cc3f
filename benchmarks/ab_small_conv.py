"""Dilated-conv lowering A/B at STUDENT widths (round-3 follow-up to the
floor analysis).

The optimized HLO of the one-shot student shows XLA lowering the width-64
flow convs with a sublane-batch VPU window emitter (backend_config
convolution_algorithm_config "EmitAllBatchInSublanes", estimated ~4.7M
cycles per conv) rather than MXU GEMMs — explaining the measured ~14x gap
per fusion.  The round-1 negative result (shifted-view matmul 18% slower
than XLA) was measured on the WIDTH-512 teacher, where XLA's conv does use
the MXU; this tool re-runs that comparison at the student's shapes.

Compares, interleaved in one process:
  conv:   ops/conv.py conv1d (lax.conv_general_dilated)
  matmul: sum_k shift(x, k*d) @ W[k]  (three [B*L, C] GEMMs)

Usage: python benchmarks/ab_small_conv.py [width] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.ops import conv as conv_ops
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

B, L, FL, DIL = 16, 64000, 3, 8


def conv_matmul(w, b, x, dilation):
    """Causal dilated conv as shifted-view matmuls: w [fl, cin, cout]."""
    fl = w.shape[0]
    pad = (fl - 1) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    acc = None
    for k in range(fl):
        xs = jax.lax.dynamic_slice_in_dim(xp, k * dilation, x.shape[1], axis=1)
        term = jnp.dot(
            xs.astype(jnp.bfloat16), w[k].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    return acc + b


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    layers = 10  # time a stack so per-dispatch overhead amortizes

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, L, width), jnp.float32)
    ws = [
        {
            "w": 0.1 * jax.random.normal(jax.random.PRNGKey(i), (FL, width, width)),
            "b": jnp.zeros((width,)),
        }
        for i in range(layers)
    ]

    def stack_conv(ws, x):
        for p in ws:
            x = conv_ops.conv1d(p, x, dilation=DIL, causal=True,
                                dtype=jnp.bfloat16)
        return jnp.mean(jnp.abs(x))

    def stack_matmul(ws, x):
        for p in ws:
            x = conv_matmul(p["w"], p["b"], x, DIL)
        return jnp.mean(jnp.abs(x))

    fns = {}
    for name, f in (("conv", stack_conv), ("matmul", stack_matmul)):
        jf = jax.jit(f)
        t0 = time.time()
        out = float(np.asarray(jf(ws, x)))
        print(f"{name}: compile+first {time.time() - t0:.1f}s (out {out:.4f})",
              file=sys.stderr)
        fns[name] = (jf, [])

    # numeric agreement (bf16 tolerances)
    a = np.asarray(jax.jit(stack_conv)(ws, x))
    b = np.asarray(jax.jit(stack_matmul)(ws, x))
    print(f"agreement: conv {a:.5f} vs matmul {b:.5f}")

    for rep in range(reps):
        for name, (jf, times) in fns.items():
            t0 = time.time()
            np.asarray(jf(ws, x))
            times.append(time.time() - t0)
    meds = {}
    for name, (jf, times) in fns.items():
        meds[name] = float(np.median(times))
        per_layer = meds[name] / layers * 1e3
        print(f"{name}: median {meds[name] * 1e3:.1f} ms for {layers} layers "
              f"({per_layer:.2f} ms/layer, spread "
              f"{min(times) * 1e3:.0f}-{max(times) * 1e3:.0f})")
    print(f"matmul speedup over conv: {meds['conv'] / meds['matmul']:.2f}x")


if __name__ == "__main__":
    main()
