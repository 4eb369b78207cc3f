"""One-shot parallel (IAF) synthesis.

Reference wavenet/parallelgen.py builds a session-bound graph per utterance
and logs a wall-clock "Delay" metric (:43-50).  Here synthesis is one jitted
function: mel -> base noise -> IAF flows -> clip/quantize -> audio, all on
device; the Delay metric lives in the eval CLI / bench harness.

Two compute paths:

  * XLA (`synthesize`): ParallelWavenet.feed_forward as-is.  Round-3 floor
    analysis (benchmarks/floor_student.py) measured it ~11x above the
    device floor — XLA lowers every width-64 flow conv with the VPU window
    emitter and round-trips the [B, L, 64] stream through HBM per layer.
  * fused Pallas (`feed_forward_pallas` / `synthesize_pallas`): each flow's
    dilated trunk runs as chained ops/flow_kernel stack calls (one per
    num_stages-layer dilation cycle; `layers_per_call` fuses whole cycles)
    with all inter-layer activations in VMEM, the per-layer mel-cond 1x1s
    computed IN-KERNEL from the raw deconv encoding; the whole path is
    time-major so HBM sees no layout copies; the start conv, out heads
    and f32 flow composition stay in XLA (measured round-5: an in-kernel
    out-head epilogue was 20% SLOWER — profile_student_tail.py).
  * streaming (`StudentStreamer`): the fused path chunk-by-chunk with
    carried dilation state — ONE compiled program serves any utterance
    length (the AR path's generate_streaming design).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.models import wavenet as wavenet_lib
from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
from nsynth_wavenet_tpu.ops import conv as conv_ops
from nsynth_wavenet_tpu.ops import flow_kernel as flow_kernel_ops
from nsynth_wavenet_tpu.ops import stft as stft_ops


def synthesize(pwn: ParallelWavenet, params, mel, rng):
    """mel [B, T, num_mel] -> audio [B, L] with L snapped to a multiple of
    max_dilation (reference parallel_wavenet.py:294-302, parallelgen.py:22-51).
    """
    ff, _ = pwn.feed_forward(params, {"mel": mel}, rng)
    return pwn._clip_quant_scale(ff["x"])


def synthesize_from_wav(pwn: ParallelWavenet, params, wav, rng):
    """Raw wav batch -> mel (on device) -> synthesis."""
    mel = stft_ops.melspectrogram(wav)
    return synthesize(pwn, params, mel, rng)


def jit_synthesize(pwn: ParallelWavenet):
    return jax.jit(lambda params, mel, rng: synthesize(pwn, params, mel, rng))


# ---------------------------------------------------------------------------
# Fused-Pallas serving path
# ---------------------------------------------------------------------------


def _trim_to(enc, length):
    """Center-trim the deconv encoding to the sample length — the same
    slice wavenet.condition_add takes (reference wavenet/wavenet.py:76-85);
    hoisted before the cond precompute since every cond conv is 1x1."""
    left = (enc.shape[1] - length) // 2
    return jax.lax.dynamic_slice_in_dim(enc, left, length, axis=1)


def _mm_1x1(p, x, dtype, out_dtype=None):
    """1x1 conv as a channels-last matmul (layout-agnostic: works on the
    time-major [L, B, C] streams the fused path keeps).  Matches
    conv_ops.conv1d's mixed-precision contract: operands cast to `dtype`,
    f32 accumulation, output cast to out_dtype (None = f32)."""
    w = conv_ops.effective_kernel(p)[0]
    y = jnp.dot(
        x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
    )
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y + p["b"].astype(y.dtype)


def _iaf_flow_pallas(
    pwn, flow_params, x, enc_tm, flow_idx, *, tile, b_tile, interpret,
    compact, layers_per_call=0, fuse_cond=False
):
    """One IAF flow with the dilated trunk in the fused Pallas kernel.

    Mirrors ParallelWavenet._create_iaf (reference parallel_wavenet.py:
    200-287) with the per-layer loop replaced by ops/flow_kernel stack
    calls in enc mode: the per-layer mel-cond 1x1s run INSIDE the kernel
    against the raw deconv encoding (the precomputed-cond variant spent
    more device time on cond layout copies + HBM round trips than on the
    kernel itself — round-4 profile).  Everything stays TIME-MAJOR:
    x [L, B, 1] f32, enc_tm [L, B, DW] (center-trimmed, kernel cond dtype);
    returns dict(x, mean, scale, log_scale) like _create_iaf, time-major.
    """
    cfg = pwn.cfg
    dtype = pwn.dtype or jnp.float32
    L, B, _ = x.shape
    n_layers = cfg.num_iaf_layers[flow_idx]
    W = cfg.width
    dw = enc_tm.shape[-1]

    sw = flow_kernel_ops.stack_flow_weights(flow_params)

    # shift_right + filter-3 causal start conv over the 1-channel input as
    # three shifted outer products (in-channel dim is 1 — a conv op would
    # only add layout churn); l[t] = sum_k w[k] * x[t-3+k] + b
    w_start = conv_ops.effective_kernel(flow_params["start_conv"])  # [3,1,W]
    assert L >= 3, L  # L is a multiple of max_dilation
    taps = []
    for k in range(3):  # tap k sees x delayed by (3 - k) samples
        delay = 3 - k
        xd = jnp.concatenate(
            [jnp.zeros((delay, B, 1), x.dtype), x[: L - delay]], 0
        )
        taps.append(xd * w_start[k, 0][None, None, :])
    l = taps[0] + taps[1] + taps[2] + flow_params["start_conv"]["b"]

    # dilated trunk: chained fused stacks, one per dilation cycle (chunking
    # at num_stages boundaries preserves the 2^(i % num_stages) pattern and
    # keeps each call's carry scratch inside the VMEM budget); mel-cond
    # biases fold into the dilated-conv biases
    b_eff = sw["b"] + sw["b_cond"]
    # layers_per_call: how many layers each pallas_call covers.  Default =
    # one dilation cycle (num_stages).  A multiple of num_stages fuses
    # whole cycles into one call — fewer kernel launches and the [L, B, W]
    # trunk stream stops round-tripping HBM between cycles (at B=32/4 s
    # that handoff is ~0.5 GB written + read per boundary); the carry
    # scratch grows linearly (12.6 MB at 30 layers/b_tile=8) but fits the
    # 100 MB scoped-VMEM budget.  The 2^(i % num_stages) pattern is
    # preserved for any multiple because the kernel indexes dilations mod
    # num_stages.
    group = layers_per_call or cfg.num_stages
    assert group % cfg.num_stages == 0, (group, cfg.num_stages)
    for s in range(0, n_layers, group):
        nl = min(group, n_layers - s)
        fn = flow_kernel_ops.make_flow_stack_fn(
            nl, cfg.num_stages, W, B, L,
            tile=tile, b_tile=b_tile, interpret=interpret, compact=compact,
            cond_features=dw, time_major=True,
            # one K=3W tap issue per layer instead of three K=W issues:
            # the kernel is MXU-issue-bound (RESULTS.md round-4 probes);
            # measured ~6% per stack call at the shipped shape
            fuse_taps=True,
            fuse_cond=fuse_cond,
        )
        l = fn(
            l,
            enc_tm,
            sw["w_tap"][s : s + nl],
            b_eff[s : s + nl],
            sw["w_res"][s : s + nl],
            sw["b_res"][s : s + nl],
            sw["w_cond"][s : s + nl],
        )

    # out heads (XLA, time-major 1x1 matmuls): identical math to
    # _create_iaf's tail.  Measured (round-5, profile_student_tail.py):
    # KEEP these in XLA — the large-M head matmuls cost ~19 ms at B=32/4 s
    # where an in-kernel epilogue doing the same math cost ~50 ms (the
    # kernel is issue-bound; XLA's tail share is 17% and mostly NOT heads).
    l = jax.nn.relu(l.astype(dtype))
    l = _mm_1x1(flow_params["out1"], l, dtype, dtype)
    c = _mm_1x1(flow_params["mel_cond_out1"], enc_tm, dtype, dtype)
    l = jax.nn.relu(l + c)
    mean = _mm_1x1(flow_params["out2_mean"], l, dtype)
    scale_params = _mm_1x1(flow_params["out2_scale"], l, dtype)
    scale, log_scale = pwn.scale_log_scale(scale_params)
    return {
        "x": x * scale + mean,
        "mean": mean,
        "scale": scale,
        "log_scale": log_scale,
    }


def feed_forward_pallas(
    pwn: ParallelWavenet,
    params,
    inputs,
    rng=None,
    *,
    tile: int = 256,
    b_tile: int = 8,
    interpret: bool = None,
    compact: bool = None,
    layers_per_call: int = 0,
    fuse_cond: bool = False,
):
    """ParallelWavenet.feed_forward with the flow trunks in the fused
    Pallas kernel.  Same contract: inputs {'mel'} (+ optional 'base_x'),
    returns the ff dict (without new_params — serving never inits).


    tile/b_tile: length/batch tiles of the kernel grid.  Defaults are the
    round-4 sweep optimum at the full student ladder (tile 256 beats 128
    by ~3-6% and 512 by ~13%; b_tile 16 loses ~6-11% to 8 — RESULTS.md).
    interpret: None = auto (real kernel on TPU, interpreter elsewhere so
    the same serving entry point runs in CPU tests/drives).
    compact: bf16 enc stream + bf16 weight storage in the kernel.  None =
    follow the model's compute dtype (bf16 model -> compact kernel; an
    f32 model keeps the kernel f32 so parity tracks the XLA path at f32
    tolerances).
    """
    cfg = pwn.cfg
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compact is None:
        compact = pwn.dtype == jnp.bfloat16
    mel = inputs["mel"]
    B, num_frames, _ = mel.shape
    length = pwn.sample_length(num_frames)
    while length % tile:
        tile //= 2
    # Mosaic constraint: the batch tile must be 8-divisible or the whole
    # batch (see make_flow_stack_fn); pick the largest allowed divisor
    cands = [bt for bt in range(8, B + 1, 8) if B % bt == 0 and bt <= b_tile]
    b_tile = max(cands) if cands else B

    if "base_x" in inputs:
        x = inputs["base_x"]
        assert x.shape == (B, length), (x.shape, (B, length))
    else:
        assert rng is not None
        x = pwn.base_noise(rng, B, length)

    # the whole fused path runs TIME-MAJOR ([L, B, ...]): the kernel grids
    # over length tiles, so this hoists every per-call transpose into ONE
    # enc transpose + one [L, B] <-> [B, L] swap of the audio streams
    cond_dt = jnp.bfloat16 if compact else jnp.float32

    def enc_tm_of(mel_en):
        return jnp.transpose(_trim_to(mel_en, length), (1, 0, 2)).astype(cond_dt)

    shared_enc_tm = None
    if cfg.use_share_deconv or cfg.use_teacher_deconv:
        mel_en, _ = pwn._flow_deconv(params, None, mel, False)
        shared_enc_tm = enc_tm_of(mel_en)

    x_tm = jnp.transpose(x)[..., None]  # [L, B, 1] f32
    iaf_x = x_tm
    mean_tot, scale_tot, log_scale_tot = 0.0, 1.0, 0.0
    for fi in range(pwn.num_flows):
        fp = params["flows"][fi]
        if shared_enc_tm is None:
            mel_en, _ = pwn._flow_deconv(params, fp, mel, False)
            enc_tm = enc_tm_of(mel_en)
        else:
            enc_tm = shared_enc_tm
        iaf_dict = _iaf_flow_pallas(
            pwn, fp, iaf_x, enc_tm, fi,
            tile=tile, b_tile=b_tile, interpret=interpret, compact=compact,
            layers_per_call=layers_per_call, fuse_cond=fuse_cond,
        )
        iaf_x = iaf_dict["x"]
        scale = iaf_dict["scale"]
        mean_tot = iaf_dict["mean"] + mean_tot * scale
        scale_tot = scale_tot * scale
        log_scale_tot = log_scale_tot + iaf_dict["log_scale"]

    # [L, B, 1] -> [B, L]
    mean_tot = jnp.transpose(mean_tot[..., 0])
    scale_tot = jnp.transpose(jnp.minimum(scale_tot, np.exp(7.0))[..., 0])
    log_scale_tot = jnp.transpose(jnp.minimum(log_scale_tot, 7.0)[..., 0])
    return {
        "x": x * scale_tot + mean_tot,
        "mean_tot": mean_tot,
        "scale_tot": scale_tot,
        "log_scale_tot": log_scale_tot,
        "rand_input": x,
    }


def synthesize_pallas(pwn: ParallelWavenet, params, mel, rng, **kw):
    """Fused-Pallas twin of `synthesize` (same mel -> audio contract)."""
    ff = feed_forward_pallas(pwn, params, {"mel": mel}, rng, **kw)
    return pwn._clip_quant_scale(ff["x"])


class StudentStreamer:
    """Variable-length one-shot IAF serving from ONE compiled program.

    The non-streaming paths compile per (batch, padded-length) — on this
    backend a minutes-scale cost per distinct shape, which the reference
    also pays (it rebuilds its graph per utterance length,
    reference wavenet/parallelgen.py:11-19).  This applies the AR path's
    streaming design (models/fastgen.py generate_streaming /
    generate_pallas chunk mode) to the student: the mel is deconv-encoded
    through a length-agnostic bucketed program, and the flow trunks run
    chunk-by-chunk through streaming flow-stack kernels
    (ops/flow_kernel.py streaming=True) that carry the dilation history
    across calls — chunk boundaries land on tile boundaries, so the
    chunked run is numerically identical to the one-shot kernel on the
    same base noise.  Cross-chunk state per flow: the packed trunk
    carries plus the last 3 input samples (shift_right + filter-3 start
    conv window); the out heads and flow composition are pointwise/1x1
    and need no history.

    Base noise is drawn per chunk (rng folded with the chunk index), so
    audio differs from the one-shot path's full-length draw by noise
    realization only; pass base_x to pin the noise (tests do, for exact
    cross-path comparison).

    Dispatch discipline (this backend's tunnel makes every host->device
    call ~tens of ms, so each one is cached or hoisted): weight stacking
    is ONE jitted program cached by params identity, the zero state is
    cached, the noise draw runs inside the chunk program, chunks stay on
    device until one final fetch.  Measured (B=16, 4 s, chunk=32768):
    loop+device 156 ms vs the one-shot path's ~134 ms — ~15% streaming
    overhead for any-length serving from one compile (RESULTS.md round 4).
    """

    def __init__(self, pwn: ParallelWavenet, *, chunk: int = 32768,
                 tile: int = 256, b_tile: int = 8, mel_bucket: int = 64,
                 interpret: bool = None, compact: bool = None):
        import jax.numpy as jnp

        assert chunk % tile == 0, (chunk, tile)
        self.pwn = pwn
        self.chunk = chunk
        self.tile = tile
        self.b_tile = b_tile
        self.mel_bucket = mel_bucket
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        if compact is None:
            compact = pwn.dtype == jnp.bfloat16
        self.compact = compact
        self._chunk_fn_cache = {}
        self._deconv_cache = {}
        self._stacked_cache = None
        self._aux_cache = {}

    # -- length-agnostic deconv encode (one compile per mel bucket count) --

    def _bucketed_enc(self, dp, mel):
        cfg = self.pwn.cfg
        B, T, _ = mel.shape
        T_pad = -(-T // self.mel_bucket) * self.mel_bucket
        # the chunk grid may read up to chunk-1 samples past the trimmed
        # region; make sure the padded encoding covers it
        while T_pad * cfg.frame_shift < T * cfg.frame_shift + self.chunk:
            T_pad += self.mel_bucket
        if T_pad > T:
            mel = jnp.pad(mel, ((0, 0), (0, T_pad - T), (0, 0)))
        key = (B, T_pad)
        fn = self._deconv_cache.get(key)
        if fn is None:
            cond_dt = jnp.bfloat16 if self.compact else jnp.float32

            def encode(dp, m, n):
                enc = wavenet_lib.apply_deconv_stack_any_length(
                    dp, m, n,
                    deconv_config=cfg.deconv_config,
                    upsample_act=cfg.upsample_act,
                    use_resize_conv=cfg.use_resize_conv,
                    dtype=self.pwn.dtype,
                )
                # time-major + kernel cond dtype, once per utterance batch
                return jnp.transpose(enc, (1, 0, 2)).astype(cond_dt)

            fn = jax.jit(encode)
            self._deconv_cache[key] = fn
        return fn(dp, mel, jnp.int32(T))

    def _flow_encs(self, params, mel):
        """Returns (unique encodings, per-flow index into them) — shared
        deconv yields one encoding, so per-chunk slicing/DMA happens once."""
        cfg = self.pwn.cfg
        if cfg.use_share_deconv or cfg.use_teacher_deconv:
            enc = self._bucketed_enc(params["deconv_share"], mel)
            return [enc], [0] * self.pwn.num_flows
        encs = [
            self._bucketed_enc(fp["deconv"], mel) for fp in params["flows"]
        ]
        return encs, list(range(self.pwn.num_flows))

    # -- the per-chunk program (one compile per (batch, chunk)) -----------

    def _stack_all(self, params):
        """Per-flow kernel-layout weights (resolving weight norm) + head
        params.  Jitted into ONE program and cached: eager stacking is
        ~400 tiny ops, each a separate dispatch through this backend's
        tunnel (measured to dominate streaming wall time).  The cache key
        is the params object identity PLUS a leaf-identity fingerprint —
        jax arrays are immutable, so any weight update swaps leaf objects
        even when the caller mutates the same pytree dict in place; the
        fingerprint catches that case instead of serving stale weights."""
        fp = tuple(id(leaf) for leaf in jax.tree_util.tree_leaves(params))
        cached = self._stacked_cache
        if cached is not None and cached[0] is params and cached[2] == fp:
            return cached[1]

        def stack(params):
            flows = []
            for fp in params["flows"]:
                sw = flow_kernel_ops.stack_flow_weights(fp)
                sw = dict(sw, b_eff=sw["b"] + sw["b_cond"],
                          w_start=conv_ops.effective_kernel(fp["start_conv"]),
                          b_start=fp["start_conv"]["b"],
                          heads={k: fp[k] for k in
                                 ("out1", "mel_cond_out1", "out2_mean",
                                  "out2_scale")})
                flows.append(sw)
            return flows

        stacked = jax.jit(stack)(params)
        self._stacked_cache = (params, stacked, fp)
        return stacked

    def init_state(self, batch):
        # cached: the zero state is immutable and identical every call, and
        # each jnp.zeros is otherwise a separate dispatch through the
        # tunnel (chunk calls donate nothing — state updates are fresh
        # outputs, so reusing the zeros is safe)
        cached = self._aux_cache.get(("state0", batch))
        if cached is not None:
            return cached
        cfg = self.pwn.cfg
        state = []
        for fi in range(self.pwn.num_flows):
            groups = []
            n_layers = cfg.num_iaf_layers[fi]
            for s in range(0, n_layers, cfg.num_stages):
                nl = min(cfg.num_stages, n_layers - s)
                rows = sum(
                    2 * 2 ** (i % cfg.num_stages) for i in range(s, s + nl)
                )
                groups.append(
                    jnp.zeros((rows, batch, cfg.width), jnp.float32)
                )
            state.append({
                "xh": jnp.zeros((3, batch, 1), jnp.float32),
                "trunk": groups,
            })
        self._aux_cache[("state0", batch)] = state
        return state

    def _make_chunk_fn(self, B, enc_idx, use_noise):
        pwn, cfg = self.pwn, self.pwn.cfg
        C, W = self.chunk, cfg.width
        # Mosaic batch-tile rule (see make_flow_stack_fn): largest allowed
        # divisor of B — same resolution as feed_forward_pallas
        cands = [bt for bt in range(8, B + 1, 8)
                 if B % bt == 0 and bt <= self.b_tile]
        b_tile = max(cands) if cands else B

        def chunk_step(stacked, x_tm, rng, ci, encs, state):
            """x_tm [C, B, 1] f32 base-noise chunk (or None: drawn in-
            program from (rng, ci)); encs: unique [C, B, DW] chunks
            indexed by the static enc_idx; returns (audio [C, B],
            new_state)."""
            if use_noise:
                x_tm = jnp.transpose(
                    pwn.base_noise(jax.random.fold_in(rng, ci), B, C)
                )[..., None]
            new_state = []
            iaf_x = x_tm
            mean_tot, scale_tot, log_scale_tot = 0.0, 1.0, 0.0
            for fi in range(pwn.num_flows):
                sw = stacked[fi]
                st = state[fi]
                enc_tm = encs[enc_idx[fi]]
                n_layers = cfg.num_iaf_layers[fi]

                # start conv with the carried 3-sample window
                xh = jnp.concatenate([st["xh"], iaf_x], axis=0)  # [C+3,B,1]
                l = sum(
                    xh[k : k + C] * sw["w_start"][k, 0][None, None, :]
                    for k in range(3)
                ) + sw["b_start"]
                new_xh = xh[-3:]

                new_groups = []
                gi = 0
                for s in range(0, n_layers, cfg.num_stages):
                    nl = min(cfg.num_stages, n_layers - s)
                    fn = flow_kernel_ops.make_flow_stack_fn(
                        nl, cfg.num_stages, W, B, C,
                        tile=self.tile, b_tile=b_tile,
                        interpret=self.interpret, compact=self.compact,
                        cond_features=enc_tm.shape[-1], time_major=True,
                        streaming=True, fuse_taps=True,
                    )
                    l, g = fn(
                        l, enc_tm,
                        sw["w_tap"][s : s + nl], sw["b_eff"][s : s + nl],
                        sw["w_res"][s : s + nl], sw["b_res"][s : s + nl],
                        sw["w_cond"][s : s + nl], st["trunk"][gi],
                    )
                    new_groups.append(g)
                    gi += 1
                new_state.append({"xh": new_xh, "trunk": new_groups})

                heads = sw["heads"]
                dtype = pwn.dtype or jnp.float32
                l = jax.nn.relu(l.astype(dtype))
                l = _mm_1x1(heads["out1"], l, dtype, dtype)
                c = _mm_1x1(heads["mel_cond_out1"], enc_tm, dtype, dtype)
                l = jax.nn.relu(l + c)
                mean = _mm_1x1(heads["out2_mean"], l, dtype)
                scale_params = _mm_1x1(heads["out2_scale"], l, dtype)
                scale, log_scale = pwn.scale_log_scale(scale_params)
                iaf_x = iaf_x * scale + mean
                mean_tot = mean + mean_tot * scale
                scale_tot = scale_tot * scale
                log_scale_tot = log_scale_tot + log_scale

            mean_tot = mean_tot[..., 0]
            scale_tot = jnp.minimum(scale_tot, np.exp(7.0))[..., 0]
            audio = pwn._clip_quant_scale(x_tm[..., 0] * scale_tot + mean_tot)
            return audio, new_state

        return jax.jit(chunk_step)

    # -- driver -----------------------------------------------------------

    def synthesize(self, params, mel, rng=None, base_x=None):
        """mel [B, T, num_mel] -> audio [B, L] (L snapped like the
        one-shot path).  No outer jit: the chunk loop stays host-side so
        the single compiled (batch, chunk) program serves any length."""
        cfg = self.pwn.cfg
        B, T, _ = mel.shape
        L = self.pwn.sample_length(T)
        mel = jnp.asarray(mel)
        encs, enc_idx = self._flow_encs(params, mel)
        left = jnp.int32((T * cfg.frame_shift - L) // 2)
        stacked = self._stack_all(params)

        use_noise = base_x is None
        key = (B, use_noise)
        fn = self._chunk_fn_cache.get(key)
        if fn is None:
            fn = self._make_chunk_fn(B, tuple(enc_idx), use_noise)
            self._chunk_fn_cache[key] = fn

        if base_x is not None:
            assert base_x.shape == (B, L), (base_x.shape, (B, L))
            base_x = jnp.asarray(base_x)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        C = self.chunk
        n_chunks = -(-L // C)
        state = self.init_state(B)
        outs = []
        for ci in range(n_chunks):
            if base_x is None:
                x_c = None
            else:
                # pad the final slice from the pinned noise (values past L
                # are discarded below)
                x_c = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(base_x, ((0, 0), (0, n_chunks * C - L))),
                    ci * C, C, axis=1,
                )
                x_c = jnp.transpose(x_c)[..., None]
            enc_cs = [
                jax.lax.dynamic_slice_in_dim(e, left + ci * C, C, axis=0)
                for e in encs
            ]
            audio, state = fn(stacked, x_c, rng, jnp.int32(ci), enc_cs, state)
            # keep chunks ON DEVICE: a per-chunk np.asarray would serialize
            # the loop on the host round trip (measured 27 vs ~300
            # audio-sec/s/chip through the debug tunnel) — dispatch is
            # async, so un-fetched chunks pipeline on the device
            outs.append(audio)
        return np.asarray(jnp.concatenate(outs, axis=0)[:L]).T


def jit_synthesize_pallas(pwn: ParallelWavenet, **kw):
    return jax.jit(
        lambda params, mel, rng: synthesize_pallas(pwn, params, mel, rng, **kw)
    )


def jit_synthesize_seq_sharded(pwn: ParallelWavenet, mesh):
    """Context-parallel (time-sharded) one-shot IAF serving.

    The reference has no long-utterance story at all — its student graph is
    rebuilt per utterance length and runs on one GPU
    (reference wavenet/parallelgen.py:11-19).  The IAF stack is purely
    convolutional with a finite receptive field, so long utterances shard
    naturally along TIME: mel/noise/audio carry a ('data', 'seq') sharding
    and XLA's spatial partitioner inserts the receptive-field halo exchanges
    ((filter-1)*dilation samples per dilated conv) over ICI (SURVEY.md §5
    "long-context").  Batch entries never mix and the PRNG is counter-based,
    so the output matches the single-device run to one quantization bin
    (same bound as jit_synthesize_sharded; tests/test_sharded_serving.py).

    Use when a single utterance is too long (or latency too tight) for one
    chip: n_seq chips cut wall-clock per utterance instead of only scaling
    batch throughput.

    Requires mel frames % n_seq == 0 and sample_length % n_seq == 0 (crop
    the mel; padding instead would shift the conditioning center-trim).
    Any power-of-two n_seq <= max_dilation satisfies the second condition
    automatically (sample_length is a multiple of max_dilation).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

    assert mesh_lib.SEQ_AXIS in mesh.axis_names, mesh.axis_names
    data = mesh_lib.DATA_AXIS if mesh_lib.DATA_AXIS in mesh.axis_names else None
    mel_sh = NamedSharding(mesh, P(data, mesh_lib.SEQ_AXIS, None))
    x_sh = NamedSharding(mesh, P(data, mesh_lib.SEQ_AXIS))
    rep = mesh_lib.replicated(mesh)

    n_seq = mesh.shape[mesh_lib.SEQ_AXIS]

    def fn(params, mel, rng):
        assert mel.shape[1] % n_seq == 0, (
            f"mel frames ({mel.shape[1]}) must divide the seq axis ({n_seq}); "
            "crop the mel to a multiple"
        )
        mel = jax.lax.with_sharding_constraint(mel, mel_sh)
        B, num_frames, _ = mel.shape
        # draw the noise OUTSIDE feed_forward so the time axis can carry the
        # seq sharding from birth (the draw itself is counter-based, so the
        # values are identical to the single-device path)
        x = pwn.base_noise(rng, B, pwn.sample_length(num_frames))
        x = jax.lax.with_sharding_constraint(x, x_sh)
        ff, _ = pwn.feed_forward(params, {"mel": mel, "base_x": x})
        return pwn._clip_quant_scale(ff["x"])

    return jax.jit(fn, in_shardings=(rep, mel_sh, rep), out_shardings=x_sh)


def jit_synthesize_sharded(pwn: ParallelWavenet, mesh):
    """Data-parallel one-shot IAF serving over a device mesh (see
    fastgen.jit_generate_sharded): params replicated, mel/audio batch
    sharded over the 'data' axis; no cross-chip traffic after broadcast.
    PRNG is counter-based so the noise draw matches single-device exactly,
    but SPMD refusion can flip float rounding at quantization-bin
    boundaries — equality holds to one bin, not bitwise
    (tests/test_sharded_serving.py)."""
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    return jax.jit(
        lambda params, mel, rng: synthesize(pwn, params, mel, rng),
        in_shardings=(rep, bs, rep),
        out_shardings=bs,
    )
