"""Data-parallel serving over a device mesh (8-device virtual CPU).

The reference scales evaluation by launching one process per GPU
(run_all_eval.py); here serving is SPMD: params replicated, batch sharded
over the mesh 'data' axis.  Because generation never mixes batch entries
and the PRNG is counter-based, the sharded run must be bit-identical to the
single-device run — that equality is the whole test.
"""

import jax
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models import parallelgen
from nsynth_wavenet_tpu.models.fastgen import Fastgen, jit_generate_sharded
from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.parallel import mesh as mesh_lib

SMALL = dict(
    num_layers=4,
    num_stages=2,
    width=16,
    skip_width=8,
    deconv_width=16,
    wave_length=1280,
    double_gate_width=False,
    use_mu_law=False,
    upsample_act="leaky_relu",
    compute_dtype="float32",
)


def _mel(batch=8, length=1280, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(length) / 16000.0
    wav = 0.3 * np.sin(2 * np.pi * 200 * t)[None, :] + 0.02 * rng.randn(batch, length)
    return np.asarray(stft.melspectrogram_np(np.clip(wav, -0.99, 0.99).astype(np.float32)))


def test_fastgen_sharded_matches_single_device():
    cfg = config_lib.WavenetConfig(loss_type="mol", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    mel = _mel()
    rng = jax.random.PRNGKey(7)

    single = np.asarray(fg.generate(params, mel, rng, length=64))

    mesh = mesh_lib.make_mesh(n_data=8)
    assert mesh.shape["data"] == 8
    gen = jit_generate_sharded(fg, mesh, length=64)
    sharded = gen(params, mel, rng)
    # actually partitioned over all 8 devices, not broadcast
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), single)


def test_parallelgen_sharded_matches_single_device():
    st = dict(SMALL)
    for k in ("skip_width", "double_gate_width", "num_layers"):
        st.pop(k)
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", num_iaf_layers=(2, 2), num_samples=4, **st
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(1))
    mel = _mel()
    rng = jax.random.PRNGKey(9)

    single = np.asarray(parallelgen.synthesize(pwn, params, mel, rng))

    mesh = mesh_lib.make_mesh(n_data=8)
    synth = parallelgen.jit_synthesize_sharded(pwn, mesh)
    sharded = synth(params, mel, rng)
    assert len(sharded.sharding.device_set) == 8
    # SPMD refusion can flip float rounding at quantization-bin boundaries
    # (observed: <0.02% of samples off by exactly half a bin) — RNG itself
    # is counter-based and bitwise identical, so one bin is the right bound
    np.testing.assert_allclose(
        np.asarray(sharded), single, atol=2.0 / cfg.quant_chann, rtol=0
    )


def test_parallelgen_seq_sharded_matches_single_device():
    """Context-parallel IAF serving: time axis sharded over 'seq', XLA
    spatial partitioner inserts the conv halo exchanges.  Must reproduce the
    single-device utterance (same counter-based noise) to one bin."""
    st = dict(SMALL)
    for k in ("skip_width", "double_gate_width", "num_layers"):
        st.pop(k)
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", num_iaf_layers=(2, 2), num_samples=4, **st
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(1))
    mel = _mel(batch=2, length=1480)  # 8 frames: divisible by n_seq=4
    rng = jax.random.PRNGKey(9)

    single = np.asarray(parallelgen.synthesize(pwn, params, mel, rng))

    mesh = mesh_lib.make_mesh(n_data=2, n_seq=4)
    assert mesh.shape["seq"] == 4
    synth = parallelgen.jit_synthesize_seq_sharded(pwn, mesh)
    sharded = synth(params, mel, rng)
    assert len(sharded.sharding.device_set) == 8
    # the time axis is genuinely partitioned (not replicated) over 'seq'
    assert sharded.sharding.spec[1] == "seq"
    np.testing.assert_allclose(
        np.asarray(sharded), single, atol=2.0 / cfg.quant_chann, rtol=0
    )


def test_fastgen_pallas_sharded_matches_single_kernel():
    """shard_map'd Pallas serving (one kernel per shard, interpret mode)
    must reproduce the single-kernel run in greedy mode (greedy is
    seed-independent, so per-shard seed decorrelation cannot diverge it)."""
    from nsynth_wavenet_tpu.models.fastgen import jit_generate_pallas_sharded

    # lane-aligned config (kernel constraint: widths % 128, batch % 8/shard)
    cfg = config_lib.WavenetConfig(
        loss_type="mol",
        **{**SMALL, "width": 128, "skip_width": 128, "deconv_width": 128},
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    mel = _mel(batch=16)

    single = np.asarray(
        fg.generate_pallas(params, mel, seed=5, length=24, greedy=True,
                           interpret=True, chunk=None, mel_bucket=None)
    )

    mesh = mesh_lib.make_mesh(n_data=2)
    gen = jit_generate_pallas_sharded(
        fg, mesh, length=24, greedy=True, interpret=True, chunk=None,
        mel_bucket=None,
    )
    sharded = np.asarray(gen(params, mel, 5))
    np.testing.assert_allclose(sharded, single, atol=1e-5)
