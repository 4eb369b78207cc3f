"""Train-step tests: loss goes down, EMA/LR semantics, data pipeline,
checkpoint round-trip, and SPMD sharding over the 8-device virtual mesh
(the no-hardware multi-device strategy, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.data import dataset as data_lib
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
from nsynth_wavenet_tpu.training import checkpoint as ckpt_lib
from nsynth_wavenet_tpu.training import optimizer as opt_lib
from nsynth_wavenet_tpu.training import train_lib

TINY = dict(
    num_layers=4,
    num_stages=2,
    width=16,
    skip_width=8,
    deconv_width=16,
    wave_length=1280,
    compute_dtype="float32",
)


def _model_and_state(seed=0, **cfg_kw):
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **TINY, **cfg_kw)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(seed))
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule, grad_clip=cfg.grad_clip)
    state = train_lib.make_train_state(params, optimizer)
    return model, optimizer, state


def test_lr_schedule_piecewise():
    fn = opt_lib.piecewise_constant_lr(config_lib.DEFAULT_LR_SCHEDULE)
    assert float(fn(0)) == pytest.approx(2e-4)
    assert float(fn(89999)) == pytest.approx(2e-4)
    assert float(fn(90000)) == pytest.approx(4e-4 / 3)
    assert float(fn(240000)) == pytest.approx(2e-6)
    assert float(fn(999999)) == pytest.approx(2e-6)


def test_ema_warmup_decay():
    assert float(opt_lib.ema_decay_at(0)) == pytest.approx(0.1)
    assert float(opt_lib.ema_decay_at(90)) == pytest.approx(0.91)
    assert float(opt_lib.ema_decay_at(10_000_000)) == pytest.approx(0.9999)


def test_train_step_loss_decreases(tmp_path):
    data_lib.make_synthetic_dataset(str(tmp_path / "ds"), n_records=8, length=4000)
    ds = data_lib.Dataset(str(tmp_path / "ds"))
    model, optimizer, state = _model_and_state()
    step_fn = jax.jit(train_lib.make_wavenet_train_step(model, optimizer))
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    wav = ds.random_crop_batch(nprng, 2, 1280)
    first = None
    for i in range(150):
        state, metrics = step_fn(state, wav, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert int(state["step"]) == 150
    assert last < first - 0.3, (first, last)
    assert float(metrics["learning_rate"]) == pytest.approx(2e-4)


def test_ema_tracks_params():
    model, optimizer, state = _model_and_state()
    wav = 0.1 * np.sin(np.arange(1280) / 8.0)[None].astype(np.float32)
    step_fn = jax.jit(train_lib.make_wavenet_train_step(model, optimizer))
    state2, _ = step_fn(state, wav, jax.random.PRNGKey(0))
    # after 1 step, decay=min(.9999, 1/10)=0.1 -> shadow moved 90% toward param
    w_old = np.asarray(state["params"]["conv_start"]["w"])
    w_new = np.asarray(state2["params"]["conv_start"]["w"])
    e_new = np.asarray(state2["ema"]["conv_start"]["w"])
    np.testing.assert_allclose(e_new, 0.1 * w_old + 0.9 * w_new, rtol=1e-4, atol=1e-7)


def test_data_parallel_step_matches_single_device():
    model, optimizer, state = _model_and_state()
    rng = np.random.default_rng(1)
    wav = np.clip(0.3 * rng.standard_normal((8, 1280)), -0.99, 0.99).astype(np.float32)
    key = jax.random.PRNGKey(0)
    step_fn = train_lib.make_wavenet_train_step(model, optimizer)

    st_single, m_single = jax.jit(step_fn)(state, wav, key)

    mesh = mesh_lib.make_mesh()  # 8 CPU devices on 'data'
    state_sh = mesh_lib.shard_train_state(state, mesh)
    wav_sh = jax.device_put(wav, mesh_lib.batch_sharding(mesh))
    step_sh = train_lib.jit_train_step(step_fn, mesh_lib.batch_sharding(mesh))
    state2, m_dp = step_sh(state_sh, wav_sh, key)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5)
    # params remain replicated and match the single-device result
    np.testing.assert_allclose(
        np.asarray(state2["params"]["out2"]["w"]),
        np.asarray(st_single["params"]["out2"]["w"]),
        rtol=1e-4,
        atol=1e-7,
    )


def test_tensor_parallel_step_runs():
    """2-way data x 4-way model mesh: channel-sharded teacher step compiles,
    runs, and matches the replicated result."""
    model, optimizer, state = _model_and_state()
    rng = np.random.default_rng(2)
    wav = np.clip(0.3 * rng.standard_normal((4, 1280)), -0.99, 0.99).astype(np.float32)
    key = jax.random.PRNGKey(0)
    step_fn = train_lib.make_wavenet_train_step(model, optimizer)
    _, m_ref = jax.jit(step_fn)(state, wav, key)

    mesh = mesh_lib.make_mesh(n_data=2, n_model=4)
    state_sh = mesh_lib.shard_train_state(state, mesh)
    # verify kernels actually got model-axis sharded
    spec = state_sh["params"]["layers"][0]["dilated"]["w"].sharding.spec
    assert mesh_lib.MODEL_AXIS in str(spec)
    wav_sh = jax.device_put(wav, mesh_lib.batch_sharding(mesh))
    step_sh = train_lib.jit_train_step(step_fn, mesh_lib.batch_sharding(mesh))
    _, m_tp = step_sh(state_sh, wav_sh, key)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-5)


def test_weight_norm_resize_conv_training():
    """Weight-norm + resize-conv variant: ddi then train steps stay finite
    and decrease (covers the reference's use_weight_norm/use_resize_conv
    config combinations end to end)."""
    cfg = config_lib.WavenetConfig(
        use_mu_law=True,
        loss_type="ce",
        use_weight_norm=True,
        use_resize_conv=True,
        upsample_act="relu",
        **TINY,
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    wav = np.clip(0.3 * rng.standard_normal((4, 1280)), -0.99, 0.99).astype(np.float32)
    from nsynth_wavenet_tpu.ops import stft as stft_ops

    mel = stft_ops.melspectrogram_np(wav)
    _, params = train_lib.run_data_dep_init(model, params, wav, mel)
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
    state = train_lib.make_train_state(params, optimizer)
    step_fn = jax.jit(train_lib.make_wavenet_train_step(model, optimizer))
    first = None
    for _ in range(40):
        state, metrics = step_fn(state, wav, jax.random.PRNGKey(0))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first


def test_sequence_parallel_step_matches():
    """2 data x 2 model x 2 seq mesh: time-axis (sequence-parallel) sharded
    step must reproduce the unsharded loss — XLA inserts the dilated convs'
    receptive-field halo exchanges."""
    model, optimizer, state = _model_and_state()
    rng = np.random.default_rng(3)
    wav = np.clip(0.3 * rng.standard_normal((4, 1280)), -0.99, 0.99).astype(np.float32)
    key = jax.random.PRNGKey(0)
    ref_fn = train_lib.make_wavenet_train_step(model, optimizer)
    _, m_ref = jax.jit(ref_fn)(state, wav, key)

    mesh = mesh_lib.make_mesh(n_data=2, n_model=2, n_seq=2)
    assert mesh.axis_names == ("data", "model", "seq")
    state_sh = mesh_lib.shard_train_state(state, mesh)
    wav_sh = jax.device_put(wav, mesh_lib.batch_sharding(mesh))
    step_fn = train_lib.make_wavenet_train_step(model, optimizer, mesh=mesh)
    step_sh = train_lib.jit_train_step(step_fn, mesh_lib.batch_sharding(mesh))
    _, m_sp = step_sh(state_sh, wav_sh, key)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]), rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    model, optimizer, state = _model_and_state()
    wav = 0.1 * np.sin(np.arange(1280) / 8.0)[None].astype(np.float32)
    step_fn = jax.jit(train_lib.make_wavenet_train_step(model, optimizer))
    state, _ = step_fn(state, wav, jax.random.PRNGKey(0))

    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    assert mgr.latest_step() == 1
    _, _, template = _model_and_state(seed=99)  # different values, same shape
    restored = mgr.restore(template)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["out2"]["w"]),
        np.asarray(state["params"]["out2"]["w"]),
    )
    np.testing.assert_allclose(
        np.asarray(restored["ema"]["conv_start"]["w"]),
        np.asarray(state["ema"]["conv_start"]["w"]),
    )
    assert int(restored["step"]) == 1
    mgr.close()

    # EMA-only export (make_eval_model equivalent)
    ckpt_lib.export_ema(state, str(tmp_path / "ema_ckpt"))
    ema = ckpt_lib.load_params(str(tmp_path / "ema_ckpt"), template["params"])
    np.testing.assert_allclose(
        np.asarray(ema["out1"]["b"]), np.asarray(state["ema"]["out1"]["b"])
    )


def test_dataset_build_and_load(tmp_path):
    data_lib.make_synthetic_dataset(str(tmp_path / "ds"), n_records=5, length=9000)
    ds = data_lib.Dataset(str(tmp_path / "ds"))
    assert len(ds) == 5
    rng = np.random.default_rng(0)
    b = ds.random_crop_batch(rng, 3, 7680)
    assert b.shape == (3, 7680) and b.dtype == np.float32
    assert np.abs(b).max() <= 1.0
    init_b = ds.get_init_batch(4, 7680)
    assert init_b.shape == (4, 7680)
    # process sharding partitions the records
    ds0 = data_lib.Dataset(str(tmp_path / "ds"), process_index=0, process_count=2)
    ds1 = data_lib.Dataset(str(tmp_path / "ds"), process_index=1, process_count=2)
    assert len(ds0) + len(ds1) == 5
    it = ds.batch_iterator(2, 1280, seed=1)
    batch = next(it)
    assert batch.shape == (2, 1280)
    it.close()


def test_sequential_batches(tmp_path):
    """Eval-reader path: in-order, single-epoch, front-of-record crops
    (reference reader.py is_training=False)."""
    data_lib.make_synthetic_dataset(str(tmp_path / "ds"), n_records=5, length=9000)
    ds = data_lib.Dataset(str(tmp_path / "ds"))
    batches = list(ds.sequential_batches(2, 7680))
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    assert all(b.shape[1] == 7680 for b in batches)
    # deterministic and in record order
    np.testing.assert_array_equal(batches[0][0], ds.get_record(0)[:7680])


def test_spec_feat_mean_std(tmp_path):
    data_lib.make_synthetic_dataset(str(tmp_path / "ds"), n_records=6, length=9000)
    mean, std = data_lib.spec_feat_mean_std(
        str(tmp_path / "ds"), feat_fn=lambda x: jnp.abs(x), batch_size=8, chunk=4
    )
    assert mean.shape == (1025,) and std.shape == (1025,)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)


# ---------------------------------------------------------------------------
# Student (distillation) step on the mesh — round-2, VERDICT "Missing #4".
# ---------------------------------------------------------------------------

ST_TINY = dict(
    num_iaf_layers=(2, 2),
    num_stages=2,
    width=8,
    deconv_width=16,
    wave_length=1280,
    use_mu_law=False,
    upsample_act="leaky_relu",
    num_samples=8,
    compute_dtype="float32",
)


def _student_setup(**cfg_kw):
    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

    te_cfg = config_lib.WavenetConfig(
        loss_type="mol", use_as_teacher=True, use_mu_law=False,
        double_gate_width=False, upsample_act="leaky_relu", **TINY,
    )
    te_model = Wavenet(te_cfg)
    te_params = te_model.init_params(jax.random.PRNGKey(7))
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", power_loss_factor=1.0, contrastive_loss_factor=0.3,
        use_share_deconv=True, **ST_TINY, **cfg_kw,
    )
    pwn = ParallelWavenet(cfg, te_model)
    params = pwn.init_params(jax.random.PRNGKey(8))
    optimizer = train_lib.make_student_optimizer(cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    return pwn, te_params, optimizer, state


def _student_batch(batch=8, seed=3):
    rng = np.random.default_rng(seed)
    wav = np.clip(0.3 * rng.standard_normal((batch, 1280)), -0.99, 0.99).astype(np.float32)
    wav_rand = np.clip(0.3 * rng.standard_normal((batch, 1280)), -0.99, 0.99).astype(np.float32)
    return wav, wav_rand


def test_student_data_parallel_step_matches_single_device():
    """DP equivalence for make_pwn_train_step, mirroring the teacher's
    test_data_parallel_step_matches_single_device: the distillation step
    (IAF flows + frozen-teacher scoring + 2x STFT + MC KL) on an 8-device
    data mesh must produce the same loss and updated params as one device."""
    pwn, te_params, optimizer, state = _student_setup()
    wav, wav_rand = _student_batch()
    key = jax.random.PRNGKey(0)
    step_fn = train_lib.make_pwn_train_step(pwn, te_params, optimizer)

    st_single, m_single = jax.jit(step_fn)(state, wav, wav_rand, key)

    mesh = mesh_lib.make_mesh()  # 8 CPU devices on 'data'
    state_sh = mesh_lib.shard_train_state(state, mesh)
    te_sh = mesh_lib.shard_params(te_params, mesh)
    step_dp = train_lib.make_pwn_train_step(pwn, te_sh, optimizer)
    bs = mesh_lib.batch_sharding(mesh)
    wav_sh = jax.device_put(wav, bs)
    rand_sh = jax.device_put(wav_rand, bs)
    state2, m_dp = train_lib.jit_pwn_train_step(step_dp, bs)(state_sh, wav_sh, rand_sh, key)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_dp["kl_loss"]), float(m_single["kl_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state2["params"]["flows"][0]["start_conv"]["w"]),
        np.asarray(st_single["params"]["flows"][0]["start_conv"]["w"]),
        rtol=1e-4, atol=1e-7,
    )


def test_student_tensor_and_sequence_parallel_step_runs():
    """data 2 x model 2 x seq 2 mesh: the channel-sharded + time-sharded
    student step (wavenet_tp_spec covers the flow trees) compiles, runs,
    and matches the replicated loss."""
    pwn, te_params, optimizer, state = _student_setup()
    wav, wav_rand = _student_batch(batch=4, seed=4)
    key = jax.random.PRNGKey(1)
    _, m_ref = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, optimizer))(
        state, wav, wav_rand, key
    )

    mesh = mesh_lib.make_mesh(n_data=2, n_model=2, n_seq=2)
    state_sh = mesh_lib.shard_train_state(state, mesh)
    spec = state_sh["params"]["flows"][0]["layers"][0]["dilated"]["w"].sharding.spec
    assert mesh_lib.MODEL_AXIS in str(spec)
    te_sh = mesh_lib.shard_params(te_params, mesh)
    step_sh = train_lib.make_pwn_train_step(pwn, te_sh, optimizer, mesh=mesh)
    bs = mesh_lib.batch_sharding(mesh)
    _, m_tp = train_lib.jit_pwn_train_step(step_sh, bs)(
        state_sh, jax.device_put(wav, bs), jax.device_put(wav_rand, bs), key
    )
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-5)


def test_remat_teacher_matches_no_remat():
    """cfg.remat must change memory, not math: loss and grads identical."""
    wav = np.clip(
        0.3 * np.random.default_rng(5).standard_normal((2, 1280)), -0.99, 0.99
    ).astype(np.float32)
    from nsynth_wavenet_tpu.ops import stft as stft_ops

    mel = stft_ops.melspectrogram_np(wav)
    outs = {}
    for remat in (False, True):
        cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", remat=remat, **TINY)
        model = Wavenet(cfg)
        params = model.init_params(jax.random.PRNGKey(0))

        def loss_fn(p):
            return model.forward_loss(p, wav, mel)["loss"]

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        outs[remat] = (float(loss), grads)
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
    g0 = jax.tree_util.tree_leaves(outs[False][1])
    g1 = jax.tree_util.tree_leaves(outs[True][1])
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
