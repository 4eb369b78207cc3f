"""Train + commit golden regression checkpoints (round-2 VERDICT #6,
round-3 VERDICT #3: one per output head).

Trains a quality-smoke teacher (width 128 — Pallas-kernel compatible) for
the requested head on the formant-synthesized pseudo-speech corpus,
free-runs it, and writes

    tests/golden/tiny_{head}/params.npz   (EMA weights, int8 per-channel +
                                           f32 scales/biases, ~3 MB each)
    tests/golden/tiny_{head}/meta.json    (config + measured free-run corr)

so tests/test_golden_regression.py can catch sampler-class bugs (e.g. the
round-1 signed-shift PRNG incident, benchmarks/RESULTS.md "Sampler
correctness") in seconds instead of a 30k-step smoke.  Each head has its
OWN in-kernel sampler with its own failure modes (CE gumbel-argmax, MoL
gumbel-select+logistic, Gauss Box-Muller — ops/fastgen_kernel.py), matching
the reference's per-config committed generations (tests/pred_data-*,
Readme.md:93-107).  The free-run metrics are measured from the
ROUND-TRIPPED (int8-dequantized) weights so the gate compares like for
like.

Usage (TPU, ~10 min per head):
    python tools/make_golden_ckpt.py [--head ce|mol|gauss] [--steps 30000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_GOLDEN_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
GOLDEN_DIR = os.path.join(_GOLDEN_ROOT, "tiny_ce")
HEADS = ("ce", "mol", "gauss")
# held-out utterance seeds: METRIC_SEEDS produced the committed meta.json
# metrics; PAD_SEEDS exist only so Pallas-path checks can run at batch 8
# (kernel needs B % 8 == 0)
METRIC_SEEDS = (101, 202, 303, 404)
PAD_SEEDS = (505, 606, 707, 808)
EVAL_SEEDS = METRIC_SEEDS + PAD_SEEDS
GEN_SAMPLES = 12000  # 0.75 s


def golden_dir(head: str) -> str:
    assert head in HEADS, head
    return os.path.join(_GOLDEN_ROOT, f"tiny_{head}")


def available_heads():
    return [h for h in HEADS
            if os.path.exists(os.path.join(golden_dir(h), "meta.json"))]


def head_teacher_cfg(head: str) -> dict:
    from tools import quality_smoke as qs

    return {"ce": qs.TEACHER_CFG, "mol": qs.MOL_TEACHER_CFG,
            "gauss": qs.GAUSS_TEACHER_CFG}[head]


def golden_config(head: str = "ce"):
    from nsynth_wavenet_tpu import config as config_lib

    return config_lib.wavenet_config_from_dict(
        dict(head_teacher_cfg(head), compute_dtype="float32")
    )


def flatten_params(tree):
    import jax

    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def unflatten_params(template, flat):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    vals = []
    for p, leaf in leaves:
        a = flat[jax.tree_util.keystr(p)]
        assert a.shape == leaf.shape, (jax.tree_util.keystr(p), a.shape, leaf.shape)
        vals.append(a.astype(np.float32))
    return jax.tree_util.tree_unflatten(treedef, vals)


def quantize_flat(flat):
    """int8 per-output-channel (last axis) storage; 1-D arrays stay f32."""
    out = {}
    for k, a in flat.items():
        if a.ndim < 2 or a.size < 1024:
            out[k] = a.astype(np.float32)
            continue
        amax = np.maximum(np.abs(a).max(axis=tuple(range(a.ndim - 1)), keepdims=True), 1e-8)
        scale = (amax / 127.0).astype(np.float32)
        out[k + "#q"] = np.clip(np.round(a / scale), -127, 127).astype(np.int8)
        out[k + "#s"] = scale
    return out


def dequantize_flat(stored):
    out = {}
    for k, a in stored.items():
        if k.endswith("#q"):
            out[k[:-2]] = a.astype(np.float32) * stored[k[:-2] + "#s"]
        elif not k.endswith("#s"):
            out[k] = a
    return out


def eval_mels(n=4):
    """Deterministic held-out conditioning mels (+ source audio)."""
    from nsynth_wavenet_tpu.data.synthetic import make_speechlike_utterance
    from nsynth_wavenet_tpu.ops import stft

    wavs = []
    for s in EVAL_SEEDS[:n]:
        rng = np.random.default_rng(s)
        wavs.append(make_speechlike_utterance(rng, duration=1.0))
    wav = np.stack(wavs).astype(np.float32)
    return stft.melspectrogram_np(wav), wav


def load_golden(directory=GOLDEN_DIR):
    """Returns (model, params, meta) from the committed artifact.
    ``directory`` may be a path, a head name, or 'student' (the committed
    IAF student — returns a ParallelWavenet)."""
    import jax

    if directory in HEADS:
        directory = golden_dir(directory)
    elif directory == "student":
        directory = student_dir()
    meta = json.load(open(os.path.join(directory, "meta.json")))
    from nsynth_wavenet_tpu import config as config_lib

    if meta.get("student"):
        from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

        cfg = config_lib.pwn_config_from_dict(meta["config"])
        model = ParallelWavenet(cfg)
    else:
        from nsynth_wavenet_tpu.models.wavenet import Wavenet

        cfg = config_lib.wavenet_config_from_dict(meta["config"])
        model = Wavenet(cfg)
    template = model.init_params(jax.random.PRNGKey(0))
    stored = dict(np.load(os.path.join(directory, "params.npz")))
    params = unflatten_params(template, dequantize_flat(stored))
    return model, params, meta


def student_dir() -> str:
    return os.path.join(_GOLDEN_ROOT, "tiny_student")


def student_available() -> bool:
    return os.path.exists(os.path.join(student_dir(), "meta.json"))


def make_student_golden(steps, batch, workdir):
    """Distill a Gaussian IAF student from a freshly trained gauss teacher
    on the pseudo-speech corpus and commit it as tests/golden/tiny_student
    — the trained-weights artifact for one-shot serving regression gates
    (XLA + fused-Pallas + streaming) and the student longform check.
    Mirrors the reference's committed per-config generations
    (tests/pred_data-*, Readme.md:93-107) for the student side."""
    import jax

    from nsynth_wavenet_tpu.models import parallelgen
    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
    from nsynth_wavenet_tpu.training import runner
    from tools.quality_smoke import (
        GAUSS_TEACHER_CFG, STUDENT_CFG, make_speech_corpus, mel_track_corr,
    )

    os.makedirs(workdir, exist_ok=True)
    ds_dir = os.path.join(workdir, "ds")
    if not os.path.exists(os.path.join(ds_dir, "index.json")):
        make_speech_corpus(ds_dir)

    te_cfg_path = os.path.join(workdir, "golden_te_gauss.json")
    with open(te_cfg_path, "wt") as f:
        json.dump(dict(GAUSS_TEACHER_CFG, num_iters=steps), f)
    te_dir, _ = runner.train_wavenet(
        train_path=ds_dir, config_path=te_cfg_path,
        log_root=os.path.join(workdir, "runs"),
        total_batch_size=batch, ckpt_every_steps=10000,
    )

    st_cfg = dict(STUDENT_CFG, num_iters=steps)
    st_cfg_path = os.path.join(workdir, "golden_student.json")
    with open(st_cfg_path, "wt") as f:
        json.dump(st_cfg, f)
    st_dir, st_state = runner.train_parallel_wavenet(
        train_path=ds_dir, teacher_dir=te_dir, config_path=st_cfg_path,
        log_root=os.path.join(workdir, "runs"),
        total_batch_size=4, ckpt_every_steps=10000,
    )

    # round-trip through the committed int8 storage BEFORE measuring
    from nsynth_wavenet_tpu import config as config_lib

    flat = flatten_params(jax.device_get(st_state["ema"]))
    stored = quantize_flat(flat)
    pwn = ParallelWavenet(config_lib.pwn_config_from_dict(st_cfg))
    params = unflatten_params(pwn.init_params(jax.random.PRNGKey(0)),
                              dequantize_flat(stored))

    mels, _ = eval_mels(n=len(METRIC_SEEDS))
    audio = np.asarray(jax.jit(
        lambda p, m: parallelgen.synthesize(pwn, p, m, jax.random.PRNGKey(7))
    )(params, jnp_asarray(mels)))
    m_corr, mm_corr = mel_track_corr(audio, mels, GEN_SAMPLES)
    print(f"golden student one-shot tracking: matched {m_corr:.3f} vs "
          f"mismatched {mm_corr:.3f}")
    assert m_corr > mm_corr + 0.1, "golden student does not track conditioning"

    out_dir = student_dir()
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "params.npz"), **stored)
    meta = {
        "config": st_cfg,
        "student": True,
        "pairing": "gauss",
        "train_steps": steps,
        "teacher": dict(GAUSS_TEACHER_CFG, num_iters=steps),
        "corpus": "data/synthetic.py make_speechlike_corpus(seed=0)",
        "eval_seeds": list(METRIC_SEEDS),
        "batch_pad_seeds": list(PAD_SEEDS),
        "gen_samples": GEN_SAMPLES,
        "matched_corr": round(m_corr, 4),
        "mismatched_corr": round(mm_corr, 4),
    }
    with open(os.path.join(out_dir, "meta.json"), "wt") as f:
        json.dump(meta, f, indent=2)
    size = os.path.getsize(os.path.join(out_dir, "params.npz")) / 1e6
    print(f"wrote {out_dir} ({size:.1f} MB), runs {te_dir} / {st_dir}")


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", default="ce", choices=list(HEADS))
    ap.add_argument("--student", action="store_true",
                    help="distill + commit the tiny_student golden instead")
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/golden_ckpt")
    args = ap.parse_args()

    if args.student:
        return make_student_golden(args.steps, args.batch, args.workdir)

    import jax

    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.training import runner
    from tools.quality_smoke import make_speech_corpus, mel_track_corr

    os.makedirs(args.workdir, exist_ok=True)
    ds_dir = os.path.join(args.workdir, "ds")
    if not os.path.exists(os.path.join(ds_dir, "index.json")):
        make_speech_corpus(ds_dir)

    teacher_cfg = head_teacher_cfg(args.head)
    cfg_path = os.path.join(args.workdir, f"golden_{args.head}.json")
    with open(cfg_path, "wt") as f:
        json.dump(dict(teacher_cfg, compute_dtype="float32", num_iters=args.steps), f)

    run_dir, state = runner.train_wavenet(
        train_path=ds_dir, config_path=cfg_path,
        log_root=os.path.join(args.workdir, "runs"),
        total_batch_size=args.batch, ckpt_every_steps=10000,
    )

    # round-trip through the committed int8 storage BEFORE measuring
    flat = flatten_params(jax.device_get(state["ema"]))
    stored = quantize_flat(flat)
    model = Wavenet(golden_config(args.head))
    params = unflatten_params(model.init_params(jax.random.PRNGKey(0)),
                              dequantize_flat(stored))

    mels, _ = eval_mels(n=len(METRIC_SEEDS))
    fg = Fastgen(model)
    audio = np.asarray(
        jax.jit(lambda p, m: fg.generate(p, m, jax.random.PRNGKey(7)))(params, mels)
    )
    m_corr, mm_corr = mel_track_corr(audio, mels, GEN_SAMPLES)
    print(f"golden {args.head} free-run tracking: "
          f"matched {m_corr:.3f} vs mismatched {mm_corr:.3f}")
    assert m_corr > mm_corr + 0.1, "golden model does not track conditioning"

    out_dir = golden_dir(args.head)
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "params.npz"), **stored)
    meta = {
        "config": dict(teacher_cfg, compute_dtype="float32"),
        "head": args.head,
        "train_steps": args.steps,
        "corpus": "data/synthetic.py make_speechlike_corpus(seed=0)",
        "eval_seeds": list(METRIC_SEEDS),
        "batch_pad_seeds": list(PAD_SEEDS),
        "gen_samples": GEN_SAMPLES,
        "matched_corr": round(m_corr, 4),
        "mismatched_corr": round(mm_corr, 4),
    }
    with open(os.path.join(out_dir, "meta.json"), "wt") as f:
        json.dump(meta, f, indent=2)
    size = os.path.getsize(os.path.join(out_dir, "params.npz")) / 1e6
    print(f"wrote {out_dir} ({size:.1f} MB), run dir {run_dir}")


if __name__ == "__main__":
    main()
