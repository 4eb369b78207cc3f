"""Fused Pallas kernel for one IAF flow's dilated-conv stack (prototype).

Round-3 floor analysis showed the one-shot student ~11x above its
analytic floor: XLA lowers every width-64 flow conv with a VPU window
emitter (`EmitAllBatchInSublanes`) and materializes the [B, L, 64]
stream in HBM between layers; a GEMM reformulation at the XLA level is
2-3x WORSE (benchmarks/ab_small_conv.py).  This kernel changes the
structure instead: the whole stack of a flow runs inside ONE pallas_call,
gridded over length tiles, with every inter-layer activation resident in
VMEM — HBM sees only the flow's input tile, the precomputed conditioning
tile, and the output tile.

Layer math mirrors ParallelWavenet._create_iaf's non-gated-width trunk
(reference parallel_wavenet.py:200-287): per layer
    d   = dilated_conv(l) + cond_l          (causal, filter 3, dilation
                                             2^(i % num_stages))
    g   = sigmoid(d[:, :m]) * tanh(d[:, m:])    m = width // 2
    l'  = l + res_1x1(g)
The mel-conditioning projections for all layers are PRECOMPUTED outside
(one dense [L, deconv_width] x [deconv_width, n_layers*width] matmul —
MXU-efficient) and streamed as one [L, n_layers*width] input.

Dilation history crosses tile boundaries through per-layer VMEM carries:
layer i keeps the last 2*d_i rows of ITS OWN input stream in scratch,
slid at the end of each grid step — the same ring idea as the AR serving
kernel, but per-tile instead of per-sample and entirely in VMEM (no HBM
ring: sum(2*d) rows x [B, width] fits VMEM at small batch tiles).

Status: CORRECTNESS PROTOTYPE for the round-4 go/no-go
(docs/student_kernel_plan.md).  Parity-tested against the conv-op
reference in interpret mode (tests/test_flow_kernel.py) and timed by
benchmarks/ab_flow_kernel.py; not yet wired into parallelgen.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_flow_stack_fn(
    n_layers: int,
    num_stages: int,
    width: int,
    batch: int,
    length: int,
    *,
    tile: int = 512,
    interpret: bool = False,
    compact: bool = False,
    carry_dtype=None,
):
    """Build fn(x [B, L, W] f32, cond [B, L, NL*W] f32, w_tap [NL, 3, W, W],
    b [NL, W], w_res [NL, m, W], b_res [NL, W]) -> l_out [B, L, W] f32
    (the residual stream AFTER the last layer — flow out-heads read it).

    Causal zero history at t<0 (matches conv_ops.conv1d causal padding).
    length % tile == 0 required.

    compact: bf16 conditioning stream (+ bf16 carries unless carry_dtype
    overrides) — shrinks the dominant VMEM terms so the full student
    dilation ladder (d up to 512) fits the ~16 MB budget; the inter-layer
    residual stream l stays f32 within a tile, and the matmuls run bf16
    either way.

    carry_dtype: dtype of the dilation-history scratch.  MEASURED MOSAIC
    BUG (2026-08-20, v5e): bf16 carries produce wrong taps starting at the
    d=64 layer (rel err 0.19-0.5; same kernel with f32 carries is exact to
    bf16-matmul tolerance, and interpret mode is correct in both dtypes) —
    so compact mode defaults the carries to f32 and only the cond stream
    drops to bf16.  Revisit if a backend update fixes the relayout.
    """
    assert length % tile == 0
    m = width // 2
    dils = [2 ** (i % num_stages) for i in range(n_layers)]
    grid = (length // tile,)
    B, W = batch, width
    cond_dt = jnp.bfloat16 if compact else jnp.float32
    cdt = carry_dtype if carry_dtype is not None else jnp.float32

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1        # [tile, B, W] (block of [L, B, W])
        cond_ref = refs[i]; i += 1     # [tile, NL, B, W]
        wtap_ref = refs[i]; i += 1     # [NL, 3, W, W]
        b_ref = refs[i]; i += 1        # [NL, W]
        wres_ref = refs[i]; i += 1     # [NL, m, W]
        bres_ref = refs[i]; i += 1     # [NL, W]
        out_ref = refs[i]; i += 1      # [tile, B, W]
        carries = refs[i : i + n_layers]  # per-layer [2*d + tile, B, W] f32

        t0 = pl.program_id(0)

        # zero the carries at utterance start (causal zero history)
        @pl.when(t0 == 0)
        def _init():
            for li in range(n_layers):
                carries[li][...] = jnp.zeros_like(carries[li])

        l = x_ref[...]  # [tile, B, W] f32
        for li in range(n_layers):
            d = dils[li]
            buf = carries[li]
            # place this layer's input tile after its 2d-row history
            buf[2 * d : 2 * d + tile] = l.astype(cdt)
            # taps over the concatenated (history ++ tile) stream:
            # output index j uses rows j (t-2d), j+d (t-d), j+2d (t)
            x2 = buf[0:tile]
            x1 = buf[d : d + tile]
            x0 = l
            wt = wtap_ref[li]  # [3, W, W]
            acc = jnp.dot(
                x2.reshape(tile * B, W).astype(jnp.bfloat16),
                wt[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc += jnp.dot(
                x1.reshape(tile * B, W).astype(jnp.bfloat16),
                wt[1].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc += jnp.dot(
                x0.reshape(tile * B, W).astype(jnp.bfloat16),
                wt[2].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            d_pre = (
                acc.reshape(tile, B, W)
                + cond_ref[:, li]
                + b_ref[li][None, None, :]
            )
            gate = jax.nn.sigmoid(d_pre[:, :, :m]) * jnp.tanh(d_pre[:, :, m:])
            res = jnp.dot(
                gate.reshape(tile * B, m).astype(jnp.bfloat16),
                wres_ref[li].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).reshape(tile, B, W) + bres_ref[li][None, None, :]
            # slide the carry window BEFORE overwriting l (reads buf tail).
            # When 2d > tile the source and destination ranges OVERLAP —
            # interpret mode materializes the read first, but compiled
            # Mosaic does not guarantee memmove semantics (measured: d=512
            # with tile=128 corrupted the history, rel err 0.5).  Copy in
            # ascending tile-sized chunks: each chunk's source is disjoint
            # from every not-yet-written destination.
            step = min(tile, 2 * d)
            for off in range(0, 2 * d, step):
                n = min(step, 2 * d - off)
                buf[off : off + n] = buf[tile + off : tile + off + n]
            l = l + res
        out_ref[...] = l

    in_specs = [
        pl.BlockSpec((tile, B, W), lambda t: (t, 0, 0)),
        pl.BlockSpec((tile, n_layers, B, W), lambda t: (t, 0, 0, 0)),
        pl.BlockSpec((n_layers, 3, W, W), lambda t: (0, 0, 0, 0)),
        pl.BlockSpec((n_layers, W), lambda t: (0, 0)),
        pl.BlockSpec((n_layers, m, W), lambda t: (0, 0, 0)),
        pl.BlockSpec((n_layers, W), lambda t: (0, 0)),
    ]
    scratch = [
        pltpu.VMEM((2 * d + tile, B, W), cdt) for d in dils
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct((length, B, W), jnp.float32),
        out_specs=pl.BlockSpec((tile, B, W), lambda t: (t, 0, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def fn(x, cond, w_tap, b, w_res, b_res):
        # [B, L, W] -> time-major [L, B, W] so the grid tiles the length;
        # cond [B, L, NL*W] -> [L, NL, B, W] so per-layer slices stay
        # tile-aligned
        xt = jnp.transpose(x, (1, 0, 2)).astype(jnp.float32)
        Lc = cond.shape[1]
        ct = jnp.transpose(
            cond.reshape(B, Lc, n_layers, W), (1, 2, 0, 3)
        ).astype(cond_dt)
        out = call(xt, ct, w_tap.astype(jnp.float32), b.astype(jnp.float32),
                   w_res.astype(jnp.float32), b_res.astype(jnp.float32))
        return jnp.transpose(out, (1, 0, 2))

    return fn


def flow_stack_reference(x, cond, w_tap, b, w_res, b_res, num_stages):
    """conv-op reference for parity tests: same math via conv1d."""
    from nsynth_wavenet_tpu.ops import conv as conv_ops

    n_layers = w_tap.shape[0]
    W = x.shape[-1]
    m = W // 2
    l = x
    for li in range(n_layers):
        d = 2 ** (li % num_stages)
        p = {"w": jnp.transpose(w_tap[li], (0, 1, 2)), "b": b[li]}
        dd = conv_ops.conv1d(p, l, dilation=d, causal=True,
                             dtype=jnp.bfloat16)
        dd = dd + cond[:, :, li * W : (li + 1) * W]
        gate = jax.nn.sigmoid(dd[:, :, :m]) * jnp.tanh(dd[:, :, m:])
        res = conv_ops.conv1d({"w": w_res[li][None], "b": b_res[li]}, gate,
                              dtype=jnp.bfloat16)
        l = l + res
    return l
