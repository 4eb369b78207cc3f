"""End-to-end pipeline test: dataset build -> teacher training (with
checkpointing + resume) -> AR synthesis -> student distillation -> one-shot
synthesis — the whole framework exercised through the same code paths the
CLIs use, on tiny configs."""

import json
import os

import numpy as np

from nsynth_wavenet_tpu import evaluation
from nsynth_wavenet_tpu.data import dataset as data_lib
from nsynth_wavenet_tpu.training import runner

TE_CFG = {
    "wave_length": 1280,
    "num_layers": 4,
    "num_stages": 2,
    "filter_length": 3,
    "width": 16,
    "skip_width": 8,
    "deconv_width": 16,
    "deconv_config": [[40, 10], [80, 20]],
    "loss_type": "mol",
    "use_mu_law": False,
    "double_gate_width": False,
    "upsample_act": "leaky_relu",
    "num_iters": 6,
    "compute_dtype": "float32",
}
ST_CFG = {
    "wave_length": 1280,
    "num_iaf_layers": [2, 2],
    "num_stages": 2,
    "filter_length": 3,
    "width": 8,
    "deconv_width": 16,
    "deconv_config": [[40, 10], [80, 20]],
    "loss_type": "logistic",
    "use_mu_law": False,
    "use_share_deconv": True,
    "upsample_act": "leaky_relu",
    "num_samples": 4,
    "power_loss_factor": 1.0,
    "contrastive_loss_factor": 0.3,
    "num_iters": 4,
    "compute_dtype": "float32",
}


def test_full_pipeline(tmp_path):
    root = str(tmp_path)
    # 1. dataset from wav files through the real builder
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir)
    rng = np.random.default_rng(0)
    t = np.arange(6000) / 16000.0
    for i in range(4):
        w = 0.4 * np.sin(2 * np.pi * (150 + 40 * i) * t) + 0.01 * rng.standard_normal(6000)
        data_lib.write_wav(os.path.join(wav_dir, f"utt_{i}.wav"), np.clip(w, -0.99, 0.99))
    ds_dir = os.path.join(root, "ds")
    data_lib.build_dataset(wav_dir, ds_dir, min_len=2000)

    # 2. teacher training, new run under log_root
    te_json = os.path.join(root, "wavenet_mol_tiny.json")
    with open(te_json, "wt") as f:
        json.dump(TE_CFG, f)
    te_run, te_state = runner.train_wavenet(
        train_path=ds_dir,
        config_path=te_json,
        log_root=os.path.join(root, "runs"),
        total_batch_size=2,
        num_steps=4,
        ckpt_every_steps=2,
    )
    assert int(np.asarray(te_state["step"])) == 4
    assert os.path.exists(os.path.join(te_run, "train.log"))

    # 3. resume-by-logdir continues from the checkpoint
    te_run2, te_state2 = runner.train_wavenet(
        train_path=ds_dir, logdir=te_run, total_batch_size=2, num_steps=6,
        ckpt_every_steps=2,
    )
    assert te_run2 == te_run
    assert int(np.asarray(te_state2["step"])) == 6

    # 4. AR synthesis from the teacher EMA checkpoint
    gen_dir = os.path.join(root, "gen_teacher")
    outs = evaluation.generate_wavenet(wav_dir, te_run, gen_dir, batch_size=2)
    assert len(outs) == 4
    wav, sr = data_lib.read_wav(outs[0])
    assert sr == 16000 and len(wav) > 0 and np.isfinite(wav).all()

    # 5. student distillation against the trained teacher
    st_json = os.path.join(root, "pwn_tiny.json")
    with open(st_json, "wt") as f:
        json.dump(ST_CFG, f)
    st_run, st_state = runner.train_parallel_wavenet(
        train_path=ds_dir,
        teacher_dir=te_run,
        config_path=st_json,
        log_root=os.path.join(root, "runs"),
        total_batch_size=2,
        num_steps=2,
        ckpt_every_steps=2,
    )
    assert int(np.asarray(st_state["step"])) == 2
    # transplant contract: shared deconv starts from the teacher's weights
    # minus two Adam steps — just check it exists and is finite
    assert np.isfinite(
        np.asarray(st_state["params"]["deconv_share"]["up_1"]["w"])
    ).all()

    # 6. one-shot parallel synthesis from the student checkpoint
    gen_dir2 = os.path.join(root, "gen_student")
    outs2 = evaluation.generate_parallel_wavenet(wav_dir, st_run, gen_dir2, batch_size=2)
    assert len(outs2) == 4
    wav2, _ = data_lib.read_wav(outs2[0])
    assert np.isfinite(wav2).all() and np.abs(wav2).max() <= 1.0
