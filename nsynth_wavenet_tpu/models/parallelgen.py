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
