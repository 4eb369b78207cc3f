"""One-shot parallel (IAF) synthesis.

Reference wavenet/parallelgen.py builds a session-bound graph per utterance
and logs a wall-clock "Delay" metric (:43-50).  Here synthesis is one jitted
function: mel -> base noise -> IAF flows -> clip/quantize -> audio, all on
device; the Delay metric lives in the eval CLI / bench harness.
"""

import jax

from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
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
