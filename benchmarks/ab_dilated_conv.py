"""A/B: dilated causal conv implementations for the TRAINING path.

Compares, on the full-size teacher stack shape (30 layers, width 512,
gate 512, B x 7680), forward+backward wall time of:

  a) lax.conv_general_dilated with rhs_dilation (ops/conv.py today)
  b) matmul form: y = x_{t-2d} @ W0 + x_{t-d} @ W1 + x_t @ W2 as three
     [B*L, in] x [in, out] dots (filter taps as shifted views)

The MXU only sees contractions either way; the question is which lowering
XLA tiles better for filter_length=3 with large dilations.

Measured (1 x v5e, B=8): conv_general_dilated 70.7 ms, shifted-view matmuls
86.2 ms — XLA's native conv lowering wins (~62% MFU on the stack), so
ops/conv.py keeps lax.conv_general_dilated and a hand-written Pallas
training kernel is unlikely to pay off (docs/ROADMAP.md item 6).

Usage: python benchmarks/ab_dilated_conv.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
L = 7680
WIDTH = 512
GATE = 512
NL = 30
NS = 10


def make_params(key):
    ks = jax.random.split(key, NL)
    return [
        0.05 * jax.random.normal(k, (3, WIDTH, GATE), jnp.float32) for k in ks
    ]


def stack_conv(ws, x):
    """(a) conv_general_dilated, bf16 operands like training."""
    h = x
    for i, w in enumerate(ws):
        d = 2 ** (i % NS)
        y = jax.lax.conv_general_dilated(
            h.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            window_strides=(1,),
            padding=[(2 * d, 0)],
            rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).astype(jnp.float32)
        h = jnp.tanh(y[..., :WIDTH])
    return jnp.sum(h)


def stack_matmul(ws, x):
    """(b) shifted-view matmuls."""
    h = x
    for i, w in enumerate(ws):
        d = 2 ** (i % NS)
        hp = jnp.pad(h, ((0, 0), (2 * d, 0), (0, 0))).astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        y = (
            jnp.einsum("btc,cg->btg", hp[:, 0:L], wb[0])
            + jnp.einsum("btc,cg->btg", hp[:, d : L + d], wb[1])
            + jnp.einsum("btc,cg->btg", hp[:, 2 * d : L + 2 * d], wb[2])
        ).astype(jnp.float32)
        h = jnp.tanh(y[..., :WIDTH])
    return jnp.sum(h)


def bench(name, fn, ws, x):
    # reduce the grads to one scalar on device and fetch it: on the tunneled
    # backend block_until_ready does not round-trip, so only a host fetch
    # (np.asarray/float) actually waits for completion (cf. misc_sweep.py rtt)
    def loss_and_gnorm(ws, x):
        gs = jax.grad(fn)(ws, x)
        return sum(jnp.sum(g * g) for g in gs)

    g = jax.jit(loss_and_gnorm)
    t0 = time.time()
    float(g(ws, x))
    compile_s = time.time() - t0
    runs = 10
    t0 = time.time()
    for _ in range(runs):
        float(g(ws, x))
    dt = (time.time() - t0) / runs * 1000
    print(f"{name}: {dt:.1f} ms fwd+bwd (compile {compile_s:.0f}s)", file=sys.stderr)
    return dt


def main():
    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    key = jax.random.PRNGKey(0)
    ws = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, WIDTH), jnp.float32)
    a = bench("conv_general_dilated", stack_conv, ws, x)
    b = bench("shifted-view matmuls", stack_matmul, ws, x)
    print(f"speedup conv->matmul: {a / b:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
