"""Batch synthesis drivers shared by the eval CLIs
(reference eval_wavenet.py / eval_parallel_wavenet.py / wavenet/fastgen.py
load_batch + save_batch)."""

import glob
import os
import time

import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.data import dataset as data_lib
from nsynth_wavenet_tpu.utils import logging_utils

log = logging_utils.get_logger()


def discover_files(source_path: str, npy_only: bool = False):
    """source_path: a .wav/.npy file or a directory of them; .wav preferred
    when both exist unless npy_only (reference eval_wavenet.py:33-47)."""
    if os.path.isdir(source_path):
        wavs = sorted(glob.glob(os.path.join(source_path, "*.wav")))
        npys = sorted(glob.glob(os.path.join(source_path, "*.npy")))
        files = npys if (npy_only or not wavs) else wavs
    else:
        files = [source_path]
    assert files, f"no .wav/.npy inputs under {source_path}"
    return files


def load_mel_batch(files, sample_length: int = -1):
    """Load wavs (or precomputed [T, num_mel] .npy mels), pad to the batch
    max length, return the mel batch [B, T, num_mel]
    (reference fastgen.py:17-52 + batch_melspectrogram).  sample_length > 0
    truncates each wav (reference --sample_length)."""
    from nsynth_wavenet_tpu.ops import stft as stft_ops

    is_npy = os.path.splitext(files[0])[1] == ".npy"
    if is_npy:
        mels = [np.load(f).astype(np.float32) for f in files]
        max_t = max(m.shape[0] for m in mels)
        out = np.zeros((len(mels), max_t, mels[0].shape[1]), np.float32)
        for i, m in enumerate(mels):
            out[i, : m.shape[0]] = m
        return out
    waves = []
    for f in files:
        wav, _ = data_lib.read_wav(f, expect_sr=16000)
        waves.append(wav[:sample_length] if sample_length > 0 else wav)
    max_len = max(len(w) for w in waves)
    batch = np.zeros((len(waves), max_len), np.float32)
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w
    return stft_ops.melspectrogram_np(batch)


def _fixed_len(w, n):
    """Pad/trim a 1-D wav to exactly n samples (calibration batches stack)."""
    out = np.zeros(n, np.float32)
    m = min(len(w), n)
    out[:m] = w[:m]
    return out


def load_eval_model(ckpt_dir: str):
    """Find the config json + checkpoint in a run dir; return
    (cfg, ema_params) — eval always uses the EMA weights
    (reference fastgen.py:81-84, parallelgen.py:29-41)."""
    import jax

    jsons = [
        j
        for j in glob.glob(os.path.join(ckpt_dir, "*.json"))
        if not os.path.basename(j).startswith("norm_stats")
    ]
    assert len(jsons) == 1, f"expected one config json in {ckpt_dir}"
    cfg = config_lib.load_config(jsons[0])

    from nsynth_wavenet_tpu.training import checkpoint as ckpt_lib

    if isinstance(cfg, config_lib.ParallelWavenetConfig):
        from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

        model = ParallelWavenet(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
    else:
        from nsynth_wavenet_tpu.models.wavenet import Wavenet

        cfg = config_lib.load_config(jsons[0], use_as_teacher=True)
        model = Wavenet(cfg)
        params = model.init_params(jax.random.PRNGKey(0))

    ema_dir = os.path.join(ckpt_dir, "ema")
    if os.path.isdir(ema_dir):
        params = ckpt_lib.load_params(ema_dir, params)
    else:
        from nsynth_wavenet_tpu.training import optimizer as opt_lib
        from nsynth_wavenet_tpu.training import train_lib

        if isinstance(cfg, config_lib.ParallelWavenetConfig):
            optimizer = train_lib.make_student_optimizer(cfg, params)
        else:
            optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
        template = train_lib.make_train_state(params, optimizer)
        mgr = ckpt_lib.CheckpointManager(os.path.join(ckpt_dir, "ckpt"))
        restored = mgr.restore(template)
        mgr.close()
        assert restored is not None, f"no checkpoint under {ckpt_dir}"
        params = restored["ema"]
    return model, params


def generate_wavenet(
    source_path, ckpt_dir, save_path, batch_size=4, seed=0, use_pallas=False,
    sample_length=-1, npy_only=False, streaming_chunk=None, int8=False,
    int8_static=False,
):
    """AR teacher synthesis over a file batch (reference eval_wavenet.py).

    use_pallas: serve through the fused Pallas kernel (needs batch % 8 == 0
    and lane-aligned model widths).
    streaming_chunk: with use_pallas, carry generation state across
    fixed-size chunks so ONE compiled kernel serves every utterance length
    in the batch set (otherwise each distinct (batch, length) pays a
    compile).
    int8: with use_pallas, stream W8A8 int8 weights — the fastest serving
    mode, quality-gated on trained weights by tools/quality_smoke.py
    --compare_pallas.
    int8_static: with int8, calibrate static per-layer activation scales on
    the first batch of source wavs (ops/fastgen_kernel.py act_scale=
    'static'); requires .wav sources (mel-only .npy inputs have no audio to
    calibrate on)."""
    import jax
    import jax.numpy as jnp

    wd = jnp.int8 if int8 else jnp.bfloat16

    from nsynth_wavenet_tpu.models.fastgen import Fastgen, jit_generate_sharded
    from nsynth_wavenet_tpu.ops import stft as stft_ops
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

    model, params = load_eval_model(ckpt_dir)
    fg = Fastgen(model)
    os.makedirs(save_path, exist_ok=True)
    files = discover_files(source_path, npy_only)

    act_amax = None
    if int8_static:
        assert int8 and use_pallas, "--int8_static needs --pallas --int8"
        cal_files = [f for f in files if f.endswith(".wav")][:8]
        assert cal_files, "static act scales need .wav sources to calibrate on"
        cal_wav = np.stack([
            _fixed_len(data_lib.read_wav(f, expect_sr=16000)[0], 16000)
            for f in cal_files
        ])
        act_amax = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(cal_wav),
            jnp.asarray(stft_ops.melspectrogram_np(cal_wav)),
        )
        log.info("calibrated static act scales on %d wavs", len(cal_files))
    # multi-chip host: shard the batch over all devices that divide it
    # (single device -> plain jit; reference instead runs one eval process
    # per GPU, run_all_eval.py)
    mesh = mesh_lib.data_mesh_for_batch(batch_size)
    sharded_gen = None if use_pallas else jit_generate_sharded(fg, mesh)
    if not use_pallas:
        # commit params to the replicated sharding ONCE — otherwise every
        # batch re-broadcasts the ~60-70 MB tree to all devices
        params = mesh_lib.replicate_tree(params, mesh)
    outputs = []
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        mel = load_mel_batch(chunk, sample_length)
        t0 = time.time()
        if use_pallas:
            if mel.shape[0] % 8 != 0:
                mel = np.pad(mel, ((0, -mel.shape[0] % 8), (0, 0), (0, 0)))
            if streaming_chunk:
                # no outer jit: the chunk loop must stay host-side so the
                # single compiled (batch, chunk) kernel serves any length
                audio = np.asarray(
                    fg.generate_pallas(params, mel, seed + i,
                                       chunk=streaming_chunk, weight_dtype=wd,
                                       act_amax=act_amax,
                                       gate_static=act_amax is not None)
                )[: len(chunk)]
            else:
                audio = np.asarray(
                    jax.jit(
                        lambda p, m, s: fg.generate_pallas(
                            p, m, s, weight_dtype=wd, act_amax=act_amax,
                            gate_static=act_amax is not None,
                        )
                    )(params, mel, seed + i)
                )[: len(chunk)]
        elif mel.shape[0] == batch_size:
            audio = np.asarray(sharded_gen(params, mel, jax.random.PRNGKey(seed + i)))
        else:  # ragged tail batch: plain jit, no resharding constraint
            audio = np.asarray(
                jax.jit(fg.generate)(params, mel, jax.random.PRNGKey(seed + i))
            )
        dt = time.time() - t0
        audio_sec = audio.shape[0] * audio.shape[1] / 16000.0
        log.info(
            "fastgen batch of %d: %.2f audio-sec in %.2fs (Delay %.3f)",
            len(chunk), audio_sec, dt, dt / audio_sec,
        )
        for f, wav in zip(chunk, audio):
            name = "gen_" + os.path.splitext(os.path.basename(f))[0] + ".wav"
            out = os.path.join(save_path, name)
            data_lib.write_wav(out, wav)
            outputs.append(out)
    return outputs


def generate_parallel_wavenet(
    source_path, ckpt_dir, save_path, batch_size=4, seed=0,
    sample_length=-1, npy_only=False, use_pallas=False,
    streaming_chunk=None,
):
    """One-shot student synthesis with the Delay metric
    (reference eval_parallel_wavenet.py + parallelgen.py:43-50).

    use_pallas: run the flow trunks through the fused Pallas kernel
    (parallelgen.synthesize_pallas) — the fast serving path; the batch is
    padded to a multiple of the kernel's batch tile.
    streaming_chunk: with use_pallas, stream the flows chunk-by-chunk with
    carried dilation state (parallelgen.StudentStreamer) so ONE compiled
    program serves every utterance length in the batch set (otherwise
    each distinct (batch, padded-length) pays a compile)."""
    import jax

    from nsynth_wavenet_tpu.models import parallelgen
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

    model, params = load_eval_model(ckpt_dir)
    os.makedirs(save_path, exist_ok=True)
    files = discover_files(source_path, npy_only)
    streamer = None
    if streaming_chunk:
        assert use_pallas, "--streaming_chunk needs --pallas"
        chunk = -(-streaming_chunk // 256) * 256  # kernel tile alignment
        streamer = parallelgen.StudentStreamer(model, chunk=chunk, tile=256)
    if use_pallas:
        synth = synth_sharded = parallelgen.jit_synthesize_pallas(model)
    else:
        synth = parallelgen.jit_synthesize(model)
        mesh = mesh_lib.data_mesh_for_batch(batch_size)
        synth_sharded = parallelgen.jit_synthesize_sharded(model, mesh)
        # commit params to the replicated sharding once (not per batch)
        params = mesh_lib.replicate_tree(params, mesh)
    outputs = []
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        mel = load_mel_batch(chunk, sample_length)
        if use_pallas and mel.shape[0] % 8 != 0 and mel.shape[0] > 4:
            # pad to the kernel's b_tile so the batch grid divides evenly
            mel = np.pad(mel, ((0, -mel.shape[0] % 8), (0, 0), (0, 0)))
        t0 = time.time()
        if streamer is not None:
            audio = streamer.synthesize(
                params, mel, rng=jax.random.PRNGKey(seed + i)
            )[: len(chunk)]
        else:
            fn = synth_sharded if mel.shape[0] == batch_size else synth
            audio = np.asarray(fn(params, mel, jax.random.PRNGKey(seed + i)))[
                : len(chunk)
            ]
        dt = time.time() - t0
        audio_sec = audio.shape[0] * audio.shape[1] / 16000.0
        log.info(
            "parallelgen batch of %d: %.2f audio-sec in %.2fs (Delay %.3f)",
            len(chunk), audio_sec, dt, dt / audio_sec,
        )
        for f, wav in zip(chunk, audio):
            name = "gen_" + os.path.splitext(os.path.basename(f))[0] + ".wav"
            out = os.path.join(save_path, name)
            data_lib.write_wav(out, wav)
            outputs.append(out)
    return outputs
