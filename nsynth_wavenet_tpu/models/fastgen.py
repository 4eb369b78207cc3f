"""Device-resident autoregressive WaveNet synthesis ("fastgen").

The reference's Fast-WaveNet sampler keeps per-layer FIFO queues in the TF
runtime and drives ONE session.run plus TWO host<->device transfers per audio
sample — 16,000 round trips per generated second (reference
wavenet/fastgen.py:156-168, wavenet/wavenet.py:318-514, masked.py:328-405).

TPU-native redesign: the entire utterance is ONE XLA program.

  * The queue pair of ``causal_linear`` (states at t-d and t-2d,
    masked.py:352-359) becomes a per-layer **ring buffer** of length
    2*dilation carried through ``lax.scan``.  Slot (t mod 2d) is read
    (yielding the t-2d state) and then overwritten with the t state; slot
    ((t-d) mod 2d) yields the t-d state.  Zero-initialized buffers reproduce
    the reference's zero-filled queue init (fastgen.py:150).
  * Mel conditioning projections for every layer are precomputed for the
    whole utterance as big MXU matmuls before the scan (the reference has an
    equivalent but unused precompute path, fastgen.py:91-115); the scan body
    just gathers one timestep.
  * Sampling (CE / MoL / Gauss) happens inside the scan body with a folded
    PRNG key; the int sample is decoded (inverse mu-law / dequantize) on
    device and fed back — nothing touches the host until the full waveform
    is done.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import conv as conv_ops
from nsynth_wavenet_tpu.ops import distributions as dist
from nsynth_wavenet_tpu.ops import signal as sig
from nsynth_wavenet_tpu.ops import stft as stft_ops


def _step_weights(params, dtype=None):
    """Flatten conv params into per-step matmul weights (resolve weight norm).

    Kernel [3, in, out] -> stacked [3*in, out] so each scan step does one
    matmul against the concatenated (t-2d, t-d, t) states.  AR generation is
    weight-streaming-bound (every step re-reads all step weights from HBM),
    so the matrices are cast to the compute dtype (bf16) once up front —
    biases stay f32 (accumulation via preferred_element_type=f32).
    """

    def mat(p):
        w = conv_ops.effective_kernel(p)  # [fl, in, out]
        fl, cin, cout = w.shape
        w = w.reshape(fl * cin, cout)
        if dtype is not None:
            w = w.astype(dtype)
        return w, p["b"]

    out = {
        "conv_start": mat(params["conv_start"]),
        "skip_start": mat(params["skip_start"]),
        "out1": mat(params["out1"]),
        "out2": mat(params["out2"]),
        "layers": [],
    }
    for lp in params["layers"]:
        # res and skip share their input (the gated activation): one fused
        # [m, width+skip] matmul halves the per-layer dispatch count
        rw, rb = mat(lp["res"])
        skw, skb = mat(lp["skip"])
        out["layers"].append(
            {
                "dilated": mat(lp["dilated"]),
                "res_skip": (
                    jnp.concatenate([rw, skw], axis=1),
                    jnp.concatenate([rb, skb]),
                ),
            }
        )
    return out


def _mm(x, w, b):
    """bf16-friendly matmul with f32 accumulation + f32 bias."""
    return (
        jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32) + b
    )


class Fastgen:
    """AR sampler sharing the teacher's param tree (reference class Fastgen,
    wavenet/wavenet.py:318-514)."""

    def __init__(self, model: Wavenet):
        self.model = model
        self.cfg = model.cfg
        self._bucketed_deconv_cache = {}

    def _bucketed_encoding(self, params, mel, mel_bucket: int):
        """Deconv the mel through the length-agnostic bucketed stack: mel is
        zero-padded to the next multiple of ``mel_bucket`` frames and the
        real frame count passed as a traced scalar, so ONE compile per
        (batch, bucket count) serves every mel length (the plain deconv
        recompiles per length — ~10 s each on TPU).  Output matches
        deconv_stack exactly on the real prefix (see
        wavenet.apply_deconv_stack_any_length)."""
        from nsynth_wavenet_tpu.models import wavenet as wavenet_lib

        cfg = self.cfg
        B, T, _ = mel.shape
        T_pad = -(-T // mel_bucket) * mel_bucket
        if T_pad > T:
            mel = jnp.pad(mel, ((0, 0), (0, T_pad - T), (0, 0)))
        key = (B, T_pad)
        fn = self._bucketed_deconv_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda p, m, n: wavenet_lib.apply_deconv_stack_any_length(
                    p["deconv"],
                    m,
                    n,
                    deconv_config=cfg.deconv_config,
                    upsample_act=cfg.upsample_act,
                    use_resize_conv=cfg.use_resize_conv,
                    dtype=self.model.dtype,
                )
            )
            self._bucketed_deconv_cache[key] = fn
        return fn(params, mel, jnp.int32(T)), T * cfg.frame_shift

    def precompute_conditioning(self, params, mel):
        """mel [B, T, num_mel] -> per-layer conditioning for every timestep.

        Returns (encoding [B, Te, dw], cond [num_layers, B, Te, gw],
        cond_out1 [B, Te, skip_width]).
        """
        encoding, _ = self.model.deconv_stack(params, mel)
        dtype = self.model.dtype
        conds = [
            conv_ops.conv1d(lp["mel_cond"], encoding, dtype=dtype)
            for lp in params["layers"]
        ]
        cond_out1 = conv_ops.conv1d(params["mel_cond_out1"], encoding, dtype=dtype)
        return encoding, jnp.stack(conds, axis=0), cond_out1

    def _stacked_cond_weights(self, params, dtype):
        """All mel-conditioning 1x1 kernels stacked into one matrix so the
        scan body computes every layer's conditioning with a single matmul:
        [deconv_width, num_layers*gate_width + skip_width] (+ bias row)."""
        mats, biases = [], []
        for lp in params["layers"]:
            mats.append(conv_ops.effective_kernel(lp["mel_cond"])[0])  # [dw, gw]
            biases.append(lp["mel_cond"]["b"])
        mats.append(conv_ops.effective_kernel(params["mel_cond_out1"])[0])
        biases.append(params["mel_cond_out1"]["b"])
        w = jnp.concatenate(mats, axis=1)
        if dtype is not None:
            w = w.astype(dtype)
        return w, jnp.concatenate(biases)

    def init_carry(self, batch: int, rng):
        """Fresh generation state: zeroed ring buffers (== the reference's
        zero-filled queues), zero previous sample, the PRNG key, global t=0."""
        cfg = self.cfg
        buffers = {
            "x": jnp.zeros((batch, 2, 1), jnp.float32),
            "layers": [
                jnp.zeros((batch, 2 * 2 ** (i % cfg.num_stages), cfg.width), jnp.float32)
                for i in range(cfg.num_layers)
            ],
        }
        return (buffers, jnp.zeros((batch,), jnp.float32), rng, jnp.zeros((), jnp.int32))

    def generate(
        self,
        params,
        mel,
        rng,
        length: Optional[int] = None,
        *,
        teacher_force: Optional[jnp.ndarray] = None,
        cond_offset: int = 0,
        collect_out_params: bool = False,
        precompute_cond: Optional[bool] = None,
        encoding: Optional[jnp.ndarray] = None,
        carry_in=None,
        return_carry: bool = False,
    ):
        """Synthesize audio for a mel batch.  Returns float wav [B, L]
        (or (wav, out_params) when collect_out_params).

        length defaults to the upsampled encoding length (the reference
        synthesizes one sample per encoding frame, eval_wavenet.py:55-60).

        teacher_force [B, L]: feed ground-truth samples back instead of the
        model's own (for testing step-network equivalence with training).
        cond_offset: shift into the conditioning timeline — training
        center-trims the (longer) encoding (wavenet.py:76-85); pass
        (enc_len - L)//2 to reproduce that alignment.
        precompute_cond: precompute all per-layer conditioning up front
        (O(layers*B*T*gate_width) memory, less in-scan compute) vs compute
        it per step with one stacked matmul (enables large batches).  Auto
        by memory estimate when None.
        encoding / carry_in / return_carry: streaming mode — pass an
        already-upsampled encoding chunk and the carry from the previous
        chunk; one compiled program then serves utterances of any length
        (see generate_streaming).
        """
        cfg = self.cfg
        num_layers = cfg.num_layers
        width = cfg.width
        gate_width = cfg.gate_width
        m = gate_width // 2
        half = cfg.quant_chann // 2
        dtype = self.model.dtype
        B = mel.shape[0] if encoding is None else encoding.shape[0]

        if precompute_cond is None:
            frames = mel.shape[1] * cfg.frame_shift if encoding is None else encoding.shape[1]
            est_bytes = num_layers * B * frames * gate_width * 4
            precompute_cond = est_bytes <= 2 * 1024**3

        if encoding is None:
            encoding, _ = self.model.deconv_stack(params, mel)
        if precompute_cond:
            conds = jnp.stack(
                [
                    conv_ops.conv1d(lp["mel_cond"], encoding, dtype=dtype)
                    for lp in params["layers"]
                ],
                axis=0,
            )
            cond_out1 = conv_ops.conv1d(params["mel_cond_out1"], encoding, dtype=dtype)
        else:
            cond_w, cond_b = self._stacked_cond_weights(params, dtype)
        enc_len = encoding.shape[1]
        L = (enc_len - cond_offset) if length is None else length
        assert L + cond_offset <= enc_len, (L, cond_offset, enc_len)

        sw = _step_weights(params, dtype)

        # ring buffers: input taps for conv_start over the scalar wav input,
        # and per-layer taps over the residual activations l.
        buffers = None if carry_in is not None else self.init_carry(B, rng)[0]

        def read_write(buf, t, dilation, new_val):
            """Read states at t-2d and t-d, then write new_val at slot t mod 2d.

            buf: [B, 2d, C]; new_val: [B, C].  Returns (s2d, sd, new_buf).
            """
            size = 2 * dilation
            slot_w = jnp.mod(t, size)
            slot_1 = jnp.mod(t - dilation, size)
            s2d = jax.lax.dynamic_slice_in_dim(buf, slot_w, 1, axis=1)[:, 0]
            sd = jax.lax.dynamic_slice_in_dim(buf, slot_1, 1, axis=1)[:, 0]
            new_buf = jax.lax.dynamic_update_slice_in_dim(
                buf, new_val[:, None, :], slot_w, axis=1
            )
            return s2d, sd, new_buf

        def step(carry, t):
            bufs, prev_sample, key, t0 = carry
            key, sample_key = jax.random.split(key)
            tg = t + t0  # global time (ring-buffer slot phase)

            if teacher_force is not None:
                prev_sample = jnp.where(
                    t == 0,
                    jnp.zeros((B,), jnp.float32),
                    teacher_force[:, jnp.maximum(t - 1, 0)],
                )

            # scale the fed-back sample like the training input
            # (reference wavenet.py:411-418)
            if cfg.use_mu_law:
                x_scaled = sig.mu_law(prev_sample) / float(half)
            else:
                x_scaled = prev_sample
            x_in = x_scaled[:, None]  # [B, 1]

            s2d, sd, new_xbuf = read_write(bufs["x"], tg, 1, x_in)
            stack = jnp.concatenate([s2d, sd, x_in], axis=1)  # [B, 3]
            l = _mm(stack, *sw["conv_start"])  # [B, width]

            s = _mm(l, *sw["skip_start"])  # [B, skip]

            tc = t + cond_offset
            if precompute_cond:
                layer_cond = lambda i: conds[i, :, tc, :]
                out1_cond = cond_out1[:, tc, :]
            else:
                # one stacked matmul for every layer's conditioning
                c_all = _mm(encoding[:, tc, :], cond_w, cond_b)
                layer_cond = lambda i: c_all[:, i * gate_width : (i + 1) * gate_width]
                out1_cond = c_all[:, num_layers * gate_width :]

            new_lbufs = []
            for i in range(num_layers):
                dilation = 2 ** (i % cfg.num_stages)
                s2d, sd, nb = read_write(bufs["layers"][i], tg, dilation, l)
                new_lbufs.append(nb)
                stack = jnp.concatenate([s2d, sd, l], axis=1)  # [B, 3*width]
                lw = sw["layers"][i]
                d = _mm(stack, *lw["dilated"])  # [B, gw]
                d = d + layer_cond(i)
                d = jax.nn.sigmoid(d[:, :m]) * jnp.tanh(d[:, m:])
                rs = _mm(d, *lw["res_skip"])  # [B, width + skip]
                l = l + rs[:, :width]
                s = s + rs[:, width:]

            s = jax.nn.relu(s)
            s = _mm(s, *sw["out1"]) + out1_cond
            s = jax.nn.relu(s)
            out = _mm(s, *sw["out2"])  # [B, out_width]

            if cfg.loss_type == "ce":
                q = dist.ce_sample(sample_key, out, cfg.quant_chann)
            elif cfg.loss_type == "mol":
                q = dist.mol_sample(sample_key, out, cfg.quant_chann)
            else:
                q = dist.gauss_sample(sample_key, out, cfg.quant_chann)

            if cfg.use_mu_law:
                audio = sig.inv_mu_law(q)
            else:
                audio = sig.inv_cast_quantize(q, cfg.quant_chann)

            new_carry = ({"x": new_xbuf, "layers": new_lbufs}, audio, key, t0)
            emit = (audio, out) if collect_out_params else audio
            return new_carry, emit

        if carry_in is None:
            init = (buffers, jnp.zeros((B,), jnp.float32), rng, jnp.zeros((), jnp.int32))
        else:
            init = carry_in
        # unroll amortizes scan iteration overhead (~10% on v5e)
        final_carry, emitted = jax.lax.scan(step, init, jnp.arange(L), unroll=4)
        final_carry = (final_carry[0], final_carry[1], final_carry[2], final_carry[3] + L)
        if collect_out_params:
            audio, outs = emitted
            out_tuple = (jnp.transpose(audio), jnp.transpose(outs, (1, 0, 2)))
        else:
            out_tuple = jnp.transpose(emitted)  # [L, B] -> [B, L]
        if return_carry:
            return out_tuple, final_carry
        return out_tuple

    def generate_streaming(
        self,
        params,
        mel,
        rng,
        length: Optional[int] = None,
        *,
        chunk: int = 2000,
        precompute_cond: bool = False,
        mel_bucket: Optional[int] = 64,
    ) -> jnp.ndarray:
        """Serve utterances of ANY length with ONE compiled program.

        The non-streaming paths compile per (batch, length) — minutes of
        XLA/Mosaic compile per new utterance length on TPU.  Here the scan
        is compiled once for (batch, chunk) and the generation state (ring
        buffers + previous sample + PRNG key + global step) carries across
        chunks, so the chunk function is bit-identical to one long scan.
        The mel-upsampling deconv is likewise compiled once per
        ``mel_bucket``-frame bucket via the exact padded/masked stack
        (pass mel_bucket=None for the plain per-length deconv).
        """
        cfg = self.cfg
        if mel_bucket is not None:
            encoding, real_len = self._bucketed_encoding(params, mel, mel_bucket)
            B, enc_len = encoding.shape[0], real_len
        else:
            encoding, _ = self.model.deconv_stack(params, mel)
            B, enc_len = encoding.shape[0], encoding.shape[1]
        L = enc_len if length is None else length
        n_chunks = -(-L // chunk)
        pad = n_chunks * chunk - encoding.shape[1]
        if pad > 0:
            encoding = jnp.pad(encoding, ((0, 0), (0, pad), (0, 0)))

        chunk_fn = jax.jit(
            lambda p, enc, c: self.generate(
                p,
                None,
                None,
                encoding=enc,
                carry_in=c,
                return_carry=True,
                precompute_cond=precompute_cond,
            )
        )
        carry = self.init_carry(B, rng)
        pieces = []
        for ci in range(n_chunks):
            enc_chunk = jax.lax.dynamic_slice_in_dim(encoding, ci * chunk, chunk, axis=1)
            audio, carry = chunk_fn(params, enc_chunk, carry)
            pieces.append(audio)
        return jnp.concatenate(pieces, axis=1)[:, :L]

    def calibrate_act_amax(self, params, wav, mel):
        """Per-layer abs-max of the residual-stream activation entering each
        dilated layer — the quantity the W8A8 act_scale='static' kernel
        quantizes — measured by a teacher-forced forward over calibration
        audio.  Returns [num_layers] f32 (host-fetchable; pass to
        generate_pallas(act_amax=...)).

        Memory note: this is a full-length f32 forward — calibrate on a
        small batch (8 rows of 1 s is plenty; amax reduces over all
        rows/timesteps), not the serving batch.

        The loop mirrors Wavenet.feed_forward's residual recursion in f32
        (the kernel's l stream is f32); skip/output heads are not needed.
        """
        cfg = self.cfg
        from nsynth_wavenet_tpu.models import wavenet as wn

        enc = self.model.encode_signal({"wav": wav})
        mel_en, _ = self.model.deconv_stack(params, mel)
        # the deconv trunk may run bf16 (cfg.compute_dtype); the calibration
        # recursion itself stays f32 like the kernel's l stream
        mel_en = mel_en.astype(jnp.float32)
        x = enc["wav_scaled"].astype(jnp.float32)[..., None]
        l = conv_ops.shift_right(x)
        l = conv_ops.conv1d(params["conv_start"], l)
        m = cfg.gate_width // 2
        amax = []
        for i in range(cfg.num_layers):
            amax.append(jnp.max(jnp.abs(l)))
            lp = params["layers"][i]
            dilation = 2 ** (i % cfg.num_stages)
            d = conv_ops.conv1d(lp["dilated"], l, dilation=dilation, causal=True)
            c = conv_ops.conv1d(lp["mel_cond"], mel_en)
            d = wn.condition_add(d, c)
            d = jax.nn.sigmoid(d[:, :, :m]) * jnp.tanh(d[:, :, m:])
            l = l + conv_ops.conv1d(lp["res"], d)
        return jnp.stack(amax)

    def generate_pallas(
        self,
        params,
        mel,
        seed: int,
        length: Optional[int] = None,
        *,
        cond_offset: int = 0,
        weight_dtype=None,
        rs_dtype=None,
        act_amax=None,
        gate_static: bool = False,
        greedy: bool = False,
        interpret: bool = False,
        chunk: Optional[int] = None,
        mel_bucket: Optional[int] = 64,
    ) -> jnp.ndarray:
        """Fused-kernel synthesis (ops/fastgen_kernel.py): the whole scan —
        weight streaming, ring-buffer DMA, sampling — inside ONE Pallas
        kernel.  ~1.5x the XLA scan path in bf16; pass weight_dtype=jnp.int8
        for per-channel-quantized weights (halves the streaming floor again;
        serving-quality tradeoff).  act_amax (int8 only): calibrated
        per-layer activation abs-max (calibrate_act_amax) switches the
        residual-stream quantization from per-row dynamic log8 scales to
        static per-layer scales — fewer VPU passes and one merged int8
        matmul per layer (ops/fastgen_kernel.py act_scale='static').

        Requires filter_length 3, lane-aligned widths (multiples of 128),
        and batch a multiple of 8.  Returns float wav [B, L].

        chunk: compile one kernel for (batch, chunk) and stream the
        generation state across chunks — any utterance length, one compile.
        """
        from nsynth_wavenet_tpu.ops import fastgen_kernel as fk

        cfg = self.cfg
        assert cfg.filter_length == 3
        B = mel.shape[0]
        assert B % 8 == 0, "pallas path needs batch % 8 == 0"
        if chunk is not None and mel_bucket is not None:
            # streaming serving: deconv also compiled once per mel bucket
            encoding, enc_len = self._bucketed_encoding(params, mel, mel_bucket)
        else:
            encoding, _ = self.model.deconv_stack(params, mel)
            enc_len = encoding.shape[1]
        L = (enc_len - cond_offset) if length is None else length
        assert L + cond_offset <= enc_len

        if weight_dtype is None:
            weight_dtype = jnp.bfloat16
        kw = fk.build_kernel_weights(
            cfg, params, weight_dtype=weight_dtype, rs_dtype=rs_dtype,
            act_amax=act_amax, gate_static=gate_static,
        )
        kw.pop("out_pad"), kw.pop("out_pad_seg")
        act_scale = "static" if act_amax is not None else "row"
        gate_scale = "static" if gate_static else "row"

        if chunk is None:
            enc_t = jnp.transpose(encoding, (1, 0, 2))[cond_offset : cond_offset + L]
            gen = fk.cached_generate_fn(
                cfg, B, L, weight_dtype=weight_dtype, rs_dtype=rs_dtype,
                act_scale=act_scale, gate_scale=gate_scale,
                greedy=greedy, interpret=interpret,
            )
            return gen(kw, enc_t, seed)

        # streaming: one kernel compiled for (B, chunk) serves any length;
        # per-chunk slice+transpose uses fixed shapes (dynamic start index)
        # so nothing here recompiles for a new utterance length.
        n_chunks = -(-L // chunk)
        need = cond_offset + n_chunks * chunk
        if need > encoding.shape[1]:
            encoding = jnp.pad(encoding, ((0, 0), (0, need - encoding.shape[1]), (0, 0)))
        gen = fk.cached_generate_fn(
            cfg, B, chunk, weight_dtype=weight_dtype, rs_dtype=rs_dtype,
            act_scale=act_scale, gate_scale=gate_scale,
            greedy=greedy, interpret=interpret, streaming=True,
        )
        state = None
        pieces = []
        for ci in range(n_chunks):
            enc_chunk = jax.lax.dynamic_slice_in_dim(
                encoding, cond_offset + ci * chunk, chunk, axis=1
            )
            audio, state = gen(kw, jnp.transpose(enc_chunk, (1, 0, 2)), seed, state=state)
            pieces.append(audio)
        return jnp.concatenate(pieces, axis=1)[:, :L]

    def generate_from_wav(self, params, wav, rng):
        """Host-free end-to-end: raw wav batch -> mel -> synthesis (the
        reference's eval path computes mel with librosa on host first)."""
        mel = stft_ops.melspectrogram(wav)
        return self.generate(params, mel, rng)


def jit_generate(fastgen: Fastgen):
    """Jitted synthesis: one compiled XLA program per (batch, length)."""
    return jax.jit(fastgen.generate)


def jit_generate_sharded(fastgen: Fastgen, mesh, **gen_kw):
    """Data-parallel AR serving over a device mesh: params replicated, the
    batch axis of mel and audio sharded over the mesh's 'data' axis.

    The scan body never mixes batch entries, so SPMD partitioning is
    communication-free after the initial param broadcast — serving
    throughput scales linearly with chips over ICI.  (The reference scales
    eval by running one process per GPU instead, run_all_eval.py.)  PRNG is
    counter-based (threefry), so sharded results are bit-identical to the
    single-device run with the same key.

    Returns fn(params, mel [B, T, M], rng) -> audio [B, L] batch-sharded;
    B must divide by the mesh's data-axis size.
    """
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def f(params, mel, rng):
        return fastgen.generate(params, mel, rng, **gen_kw)

    return jax.jit(f, in_shardings=(rep, bs, rep), out_shardings=bs)


def jit_generate_pallas_sharded(fastgen: Fastgen, mesh, **gen_kw):
    """Multi-chip serving through the fused Pallas kernel: shard_map over
    the mesh 'data' axis runs one kernel per chip on its batch shard
    (pallas_call cannot be auto-partitioned by pjit the way the XLA scan
    path can, so the batch split is explicit here).

    Each shard folds its data-axis index into the sampling seed so shards
    draw decorrelated noise; greedy mode is seed-independent and therefore
    matches the single-chip kernel exactly.  Per-shard batch must be a
    multiple of 8 (kernel constraint).

    Returns fn(params, mel [B, T, M], seed) -> audio [B, L] batch-sharded.
    """
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

    P = mesh_lib.P

    def local(params, mel, seed):
        shard = jax.lax.axis_index(mesh_lib.DATA_AXIS)
        # odd 32-bit constant decorrelates the per-shard PRNG streams
        local_seed = seed + shard * jnp.int32(0x61C88647)
        return fastgen.generate_pallas(params, mel, local_seed, **gen_kw)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
        out_specs=P(mesh_lib.DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)
