"""Fused Pallas kernel for one IAF flow's dilated-conv stack.

Round-3 floor analysis showed the one-shot student ~11x above its
analytic floor: XLA lowers every width-64 flow conv with a VPU window
emitter (`EmitAllBatchInSublanes`) and materializes the [B, L, 64]
stream in HBM between layers; a GEMM reformulation at the XLA level is
2-3x WORSE (benchmarks/ab_small_conv.py).  This kernel changes the
structure instead: the whole stack of a flow runs inside ONE pallas_call,
gridded over (batch, length) tiles, with every inter-layer activation
resident in VMEM — HBM sees only the flow's input tile, the conditioning
(raw deconv-encoding tile in the shipped enc mode; per-layer mel-cond
1x1s run IN-KERNEL against it), and the output tile.

Layer math mirrors ParallelWavenet._create_iaf's non-gated-width trunk
(reference parallel_wavenet.py:200-287): per layer
    d   = dilated_conv(l) + cond_l          (causal, filter 3, dilation
                                             2^(i % num_stages))
    g   = sigmoid(d[:, :m]) * tanh(d[:, m:])    m = width // 2
    l'  = l + res_1x1(g)

Dilation history crosses tile boundaries through per-layer VMEM carries:
layer i keeps the last 2*d_i rows of ITS OWN input stream in scratch,
slid at the end of each grid step — the same ring idea as the AR serving
kernel, but per-tile instead of per-sample and entirely in VMEM (no HBM
ring: sum(2*d) rows x [B, width] fits VMEM at small batch tiles).

Status: SHIPPED as the student serving path since round 4
(models/parallelgen.feed_forward_pallas / synthesize_pallas /
StudentStreamer; 2.2-2.7x the XLA conv path end-to-end —
benchmarks/RESULTS.md rounds 4-5).  Variants: compact (bf16 enc/weights),
streaming (carried state, any-length serving), fuse_taps (shipped).
Retired after measurement: W8A8 int8, out-head epilogue, fuse_cond-by-
default, layers_per_call>cycle (all slower — RESULTS.md round 5).
Parity: interpret-mode pytest
(tests/test_flow_kernel.py) + compiled hardware gates
(benchmarks/tpu_kernel_parity.py — interpret mode HID two real Mosaic
miscompiles, so the hardware gates are the load-bearing ones).
"""

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
    b_tile: int = 0,
    interpret: bool = False,
    compact: bool = False,
    carry_dtype=None,
    cond_features: int = 0,
    time_major: bool = False,
    streaming: bool = False,
    probe: str = None,
    allow_wrong_output: bool = False,
    fuse_taps: bool = False,
    fuse_cond: bool = False,
):
    """Build fn(x [B, L, W] f32, cond [B, L, NL*W] f32, w_tap [NL, 3, W, W],
    b [NL, W], w_res [NL, m, W], b_res [NL, W]) -> l_out [B, L, W] f32
    (the residual stream AFTER the last layer — flow out-heads read it).

    cond_features=DW switches the conditioning input from the precomputed
    [B, L, NL*W] stream to the raw deconv encoding [B, L, DW]: the
    per-layer mel-cond 1x1s run INSIDE the kernel as [tile*B, DW] x
    [DW, W] matmuls against an extra w_cond [NL, DW, W] argument (signature
    becomes fn(x, enc, w_tap, b_plus_bcond, w_res, b_res, w_cond)).
    Measured motivation (round-4 device profile at B=16/4 s): the
    precomputed-stream path spent 47 ms in pure cond-layout copies plus the
    einsum's f32 HBM round trip — more than the 46 ms the kernel itself
    took; in-kernel cond replaces all of it with one bf16 enc-tile read,
    and K=DW=256 drives the MXU harder than the K=64 taps.

    time_major: fn takes x [L, B, W] (already time-major, f32) and cond
    [L, B, ...] (already in cond_dt) and returns [L, B, W] — callers that
    chain stacks or share the encoding across flows hoist the transposes
    instead of paying a full-stream copy per call.

    Causal zero history at t<0 (matches conv_ops.conv1d causal padding).
    length % tile == 0 required.

    b_tile: batch tile (0 = whole batch per kernel instance).  The carry
    scratch scales with sum(2*d)*b_tile rows — at the full student ladder
    (d up to 512) a 10-layer stack needs ~6.8 MB of f32 carries at
    b_tile=8, so serving batches larger than ~8 must grid over batch tiles
    (grid = (B/b_tile, L/tile), length innermost so each batch row streams
    its tiles sequentially through the same carries).

    compact: bf16 conditioning stream and bf16 tap/res weight storage
    (+ bf16 carries only if carry_dtype overrides) — shrinks the dominant
    VMEM terms so the full student dilation ladder fits the ~16 MB budget;
    the inter-layer residual stream l stays f32 within a tile, and the
    matmuls run bf16 either way (weight bf16 storage is numerically
    identical: the f32 path casts to bf16 at the matmul anyway).

    carry_dtype: dtype of the dilation-history scratch.  MEASURED MOSAIC
    BUG (2026-08-20, v5e): bf16 carries produce wrong taps starting at the
    d=64 layer (rel err 0.19-0.5; same kernel with f32 carries is exact to
    bf16-matmul tolerance, and interpret mode is correct in both dtypes) —
    so compact mode defaults the carries to f32 and only the cond stream
    drops to bf16.  Revisit if a backend update fixes the relayout.

    streaming: carry the dilation history ACROSS calls so ONE compiled
    program of (batch, length=chunk) serves any utterance length (the AR
    kernel's streaming design, models/fastgen.py generate_streaming,
    applied to the one-shot student).  fn gains a trailing `state`
    argument and returns (l_out, new_state): state is the packed f32
    [sum(2*d), Bfull, W] history (layer i owns rows off_i : off_i+2*d_i),
    zeros == the fresh causal-zero history.  Chunk boundaries land on
    tile boundaries, so chaining chunk calls is numerically identical to
    one long call (the kernel does the same per-tile math either way).

    NOTE (round-5 negative result): a W8A8 int8 mode (static per-layer
    activation scales, int8 MXU dots and carries — the AR kernel's v4
    recipe) lived here through rounds 4-5.  With every optimization
    ported (fused K=3W taps, shared dequants) it measured 624.5 vs the
    bf16 path's 656.0 audio-sec/s/chip at B=32 (0.95x) — the kernel is
    issue/dependency-bound, not matmul-bound, so int8's 2x MXU rate buys
    nothing and its quantize/dequant VPU passes cost more than they save.
    The mode was removed per the one-serving-default rule;
    benchmarks/RESULTS.md round 5 records the arc.  (The AR serving
    kernel's W8A8 mode is unrelated and remains shipped.)

    probe: PERF ATTRIBUTION ONLY — produces WRONG output, so it also
    requires allow_wrong_output=True (a serving call that accidentally
    passes probe= fails loudly instead of emitting corrupt audio).
    'no_slide' skips the per-layer carry-window slide copies (bounds
    their VMEM-bandwidth/serialization share); 'no_gate' replaces
    sigmoid*tanh with two clips (VPU transcendental share).  Same
    methodology as the AR kernel's benchmarks/ab_probe.py.

    fuse_taps (bf16 path): assemble the three tap operands into one
    [tile*B, 3W] block and run ONE K=3W matmul per layer instead of three
    K=W issues — the probe attribution says the kernel is MXU-issue-
    bound, so trading VPU assembly copies for fewer serialized issues may
    pay (same math: the stacked [3W, W] weight matches the concat order).

    NOTE (round-5 negative result): an out-head kernel epilogue
    (relu -> out1 -> +mel_cond_out1 -> relu -> fused mean|scale) was
    built, parity-gated, and measured 20% SLOWER end-to-end than leaving
    the head chain in XLA (247 vs 197 ms at B=32; the epilogue's 3 extra
    per-grid-step matmul issues cost ~50 ms where XLA's large-M head
    matmuls cost ~19 ms — an issue-bound kernel pays ~2.6x for the same
    math).  The mode was removed; benchmarks/RESULTS.md round 5 records
    the numbers and benchmarks/profile_student_tail.py the decomposition.
    """
    assert probe in (None, "no_slide", "no_gate"), probe
    assert probe is None or allow_wrong_output, (
        "probe mode produces WRONG output (perf attribution only); pass "
        "allow_wrong_output=True to confirm this is not a serving call"
    )
    assert length % tile == 0
    if not b_tile:
        b_tile = batch
    assert batch % b_tile == 0, (batch, b_tile)
    # Mosaic requires the block's second-to-last dim (the batch tile here)
    # to be 8-divisible or equal to the full array dim (measured 2026-08-20:
    # b_tile=4 at batch=8 fails lowering; interpret mode doesn't enforce)
    assert interpret or b_tile % 8 == 0 or b_tile == batch, (b_tile, batch)
    m = width // 2
    dils = [2 ** (i % num_stages) for i in range(n_layers)]
    grid = (batch // b_tile, length // tile)
    B, W = b_tile, width
    if fuse_cond:
        # one K = 3W + DW issue per layer: the enc tile joins the fused
        # tap block and the cond weight column-stacks under the tap weight
        # — trades one more VPM assembly copy for one fewer serialized MXU
        # issue (the kernel is issue-bound; same logic as fuse_taps)
        assert fuse_taps and cond_features, (
            "fuse_cond extends the fused-tap block (enc mode only)"
        )
    cond_dt = jnp.bfloat16 if compact else jnp.float32
    w_dt = jnp.bfloat16 if compact else jnp.float32
    cdt = carry_dtype if carry_dtype is not None else jnp.float32

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1        # [tile, B, W] (block of [L, Bfull, W])
        cond_ref = refs[i]; i += 1     # [tile, NL, B, W] or enc [tile, B, DW]
        wtap_ref = refs[i]; i += 1     # [NL, 3, W, W]
        b_ref = refs[i]; i += 1        # [NL, W]
        wres_ref = refs[i]; i += 1     # [NL, m, W]
        bres_ref = refs[i]; i += 1     # [NL, W]
        wcond_ref = None
        if cond_features:
            wcond_ref = refs[i]; i += 1  # [NL, DW, W]
        state_ref = None
        if streaming:
            state_ref = refs[i]; i += 1  # [sum(2d), B, W] f32
        out_ref = refs[i]; i += 1      # [tile, B, W]
        state_out_ref = None
        if streaming:
            state_out_ref = refs[i]; i += 1  # [sum(2d), B, W] f32
        carries = refs[i : i + n_layers]  # per-layer [2*d + tile, B, W] f32

        t0 = pl.program_id(1)
        offs = np.concatenate([[0], np.cumsum([2 * d for d in dils])])

        # load (streaming) or zero (one-shot) the carries at chunk start —
        # the length grid dim is innermost, so this also reruns when the
        # grid advances to the next batch tile
        @pl.when(t0 == 0)
        def _init():
            for li in range(n_layers):
                if streaming:
                    st = state_ref[offs[li] : offs[li + 1]]
                    carries[li][0 : 2 * dils[li]] = st.astype(cdt)
                else:
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
            if fuse_taps and fuse_cond:
                xcat = jnp.concatenate(
                    [
                        x2.reshape(tile * B, W),
                        x1.reshape(tile * B, W),
                        x0.reshape(tile * B, W),
                        cond_ref[...]
                        .reshape(tile * B, cond_features)
                        .astype(jnp.float32),
                    ],
                    axis=1,
                ).astype(jnp.bfloat16)
                wcat = jnp.concatenate(
                    [
                        wt.reshape(3 * W, W).astype(jnp.bfloat16),
                        wcond_ref[li].astype(jnp.bfloat16),
                    ],
                    axis=0,
                )
                acc = jnp.dot(
                    xcat, wcat, preferred_element_type=jnp.float32
                )
            elif fuse_taps:
                xcat = jnp.concatenate(
                    [
                        x2.reshape(tile * B, W),
                        x1.reshape(tile * B, W),
                        x0.reshape(tile * B, W),
                    ],
                    axis=1,
                ).astype(jnp.bfloat16)
                acc = jnp.dot(
                    xcat,
                    wt.reshape(3 * W, W).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
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
            if fuse_cond:
                cond_li = 0.0  # folded into the fused tap matmul
            elif cond_features:
                # bf16 only in compact mode — non-compact keeps the
                # cond projection f32, matching stream-mode precision
                mm_dt = jnp.bfloat16 if compact else jnp.float32
                acc += jnp.dot(
                    cond_ref[...].reshape(tile * B, cond_features)
                    .astype(mm_dt),
                    wcond_ref[li].astype(mm_dt),
                    preferred_element_type=jnp.float32,
                )
                cond_li = 0.0
            else:
                cond_li = cond_ref[:, li]
            d_pre = (
                acc.reshape(tile, B, W)
                + cond_li
                + b_ref[li][None, None, :]
            )
            if probe == "no_gate":
                gate = jnp.clip(d_pre[:, :, :m], 0.0, 1.0) * jnp.clip(
                    d_pre[:, :, m:], -1.0, 1.0
                )
            else:
                gate = jax.nn.sigmoid(d_pre[:, :, :m]) * jnp.tanh(
                    d_pre[:, :, m:]
                )
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
                if probe == "no_slide":
                    break
                n = min(step, 2 * d - off)
                buf[off : off + n] = buf[tile + off : tile + off + n]
            if streaming:
                # post-slide rows 0:2d ARE the history the next chunk needs
                @pl.when(t0 == length // tile - 1)
                def _export(li=li, d=d, buf=buf):
                    state_out_ref[offs[li] : offs[li + 1]] = (
                        buf[0 : 2 * d].astype(jnp.float32)
                    )
            l = l + res
        out_ref[...] = l

    in_specs = [
        pl.BlockSpec((tile, B, W), lambda bi, t: (t, bi, 0)),
        (
            pl.BlockSpec((tile, B, cond_features), lambda bi, t: (t, bi, 0))
            if cond_features
            else pl.BlockSpec((tile, n_layers, B, W), lambda bi, t: (t, 0, bi, 0))
        ),
        pl.BlockSpec((n_layers, 3, W, W), lambda bi, t: (0, 0, 0, 0)),
        pl.BlockSpec((n_layers, W), lambda bi, t: (0, 0)),
        pl.BlockSpec((n_layers, m, W), lambda bi, t: (0, 0, 0)),
        pl.BlockSpec((n_layers, W), lambda bi, t: (0, 0)),
    ]
    if cond_features:
        in_specs.append(
            pl.BlockSpec((n_layers, cond_features, W), lambda bi, t: (0, 0, 0))
        )
    sum2d = int(sum(2 * d for d in dils))
    if streaming:
        in_specs.append(
            pl.BlockSpec((sum2d, B, W), lambda bi, t: (0, bi, 0))
        )
    scratch = [
        pltpu.VMEM((2 * d + tile, B, W), cdt) for d in dils
    ]
    # the carry scratch + pipelined blocks exceed the default 16 MB scoped-
    # VMEM budget at the full ladder on long utterances; v5e has 128 MiB of
    # VMEM, so raise the kernel's limit (measured: B=8/tile=128/4 s needs
    # ~20 MB) rather than shrinking tiles below their MXU-efficient sizes
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out_shape = jax.ShapeDtypeStruct((length, batch, W), jnp.float32)
    out_specs = pl.BlockSpec((tile, B, W), lambda bi, t: (t, bi, 0))
    if streaming:
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((sum2d, batch, W), jnp.float32),
        ]
        out_specs = [
            out_specs,
            pl.BlockSpec((sum2d, B, W), lambda bi, t: (0, bi, 0)),
        ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )

    def fn(x, cond, w_tap, b, w_res, b_res, w_cond=None, state=None):
        # [B, L, W] -> time-major [L, B, W] so the grid tiles the length;
        # cond [B, L, NL*W] -> [L, NL, B, W] so per-layer slices stay
        # tile-aligned; in enc mode cond is the raw encoding [B, L, DW] ->
        # [L, B, DW] and w_cond [NL, DW, W] rides along
        if time_major:
            xt, ct = x, cond.astype(cond_dt)
            assert cond_features or n_layers == 1, (
                "time_major stream mode would need [L, NL, B, W] cond"
            )
        else:
            xt = jnp.transpose(x, (1, 0, 2)).astype(jnp.float32)
            Bf, Lc = cond.shape[0], cond.shape[1]
            if cond_features:
                ct = jnp.transpose(cond, (1, 0, 2)).astype(cond_dt)
            else:
                ct = jnp.transpose(
                    cond.reshape(Bf, Lc, n_layers, W), (1, 2, 0, 3)
                ).astype(cond_dt)
        if cond_features:
            assert w_cond is not None
            extra = (w_cond.astype(w_dt),)
        else:
            extra = ()
        if streaming:
            assert state is not None, "streaming mode needs the carry state"
            extra = extra + (state.astype(jnp.float32),)
        out = call(xt, ct, w_tap.astype(w_dt), b.astype(jnp.float32),
                   w_res.astype(w_dt), b_res.astype(jnp.float32), *extra)
        if streaming:
            out, new_state = out
            return (
                out if time_major else jnp.transpose(out, (1, 0, 2)),
                new_state,
            )
        return out if time_major else jnp.transpose(out, (1, 0, 2))

    fn.state_rows = sum2d
    return fn


def stack_flow_weights(flow_params):
    """Stack one flow's per-layer conv params into the kernel's layout,
    resolving weight norm (conv_ops.effective_kernel).

    Returns dict:
      w_tap  [NL, 3, W, GW]   dilated-conv kernels
      b      [NL, GW]         dilated-conv biases
      w_cond [NL, DW, GW]     mel-cond 1x1 kernels (for the host-side
                              cond precompute — one dense matmul)
      b_cond [NL, GW]         mel-cond biases (folded into the cond stream)
      w_res  [NL, m, W]       res 1x1 kernels
      b_res  [NL, W]          res biases
    """
    from nsynth_wavenet_tpu.ops import conv as conv_ops

    layers = flow_params["layers"]
    return {
        "w_tap": jnp.stack([conv_ops.effective_kernel(l["dilated"]) for l in layers]),
        "b": jnp.stack([l["dilated"]["b"] for l in layers]),
        "w_cond": jnp.stack(
            [conv_ops.effective_kernel(l["mel_cond"])[0] for l in layers]
        ),
        "b_cond": jnp.stack([l["mel_cond"]["b"] for l in layers]),
        "w_res": jnp.stack([conv_ops.effective_kernel(l["res"])[0] for l in layers]),
        "b_res": jnp.stack([l["res"]["b"] for l in layers]),
    }


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
