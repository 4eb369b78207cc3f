"""Gather experiment artifacts + re-synthesize eval audio for every run
under a root directory.

Reference run_all_eval.py SSH/SCPs the latest checkpoint, event files, and
config json from N hosts and re-synthesizes locally (run_all_eval.py:52-140,
hardcoded port 36000).  On TPU pods the runs already live on shared storage,
so this walks a root (local or GCS-mounted), copies the lightweight
artifacts into a results dir, and synthesizes test utterances per run.
"""

import glob
import os
import shutil
from argparse import ArgumentParser

from nsynth_wavenet_tpu import config as config_lib


def find_runs(root: str):
    """A run dir is any directory containing exactly one config json + ckpt."""
    runs = []
    for d in sorted(glob.glob(os.path.join(root, "*"))):
        if not os.path.isdir(d):
            continue
        jsons = [
            j
            for j in glob.glob(os.path.join(d, "*.json"))
            if not os.path.basename(j).startswith("norm_stats")
        ]
        if len(jsons) == 1 and os.path.isdir(os.path.join(d, "ckpt")):
            runs.append(d)
    return runs


def copy_artifacts(run_dir: str, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    for pat in ("*.json", "train.log", "events.out.tfevents.*"):
        for f in glob.glob(os.path.join(run_dir, pat)):
            shutil.copy(f, out_dir)


def gather(root: str, test_wavs: str, results_dir: str, batch_size: int = 4):
    from nsynth_wavenet_tpu import evaluation

    runs = find_runs(root)
    print(f"found {len(runs)} runs under {root}")
    for run_dir in runs:
        name = os.path.basename(run_dir.rstrip("/"))
        out_dir = os.path.join(results_dir, name)
        copy_artifacts(run_dir, out_dir)
        jsons = [
            j
            for j in glob.glob(os.path.join(run_dir, "*.json"))
            if not os.path.basename(j).startswith("norm_stats")
        ]
        cfg = config_lib.load_config(jsons[0])
        gen_dir = os.path.join(out_dir, "generated")
        print(f"[{name}] synthesizing into {gen_dir}")
        if isinstance(cfg, config_lib.ParallelWavenetConfig):
            evaluation.generate_parallel_wavenet(test_wavs, run_dir, gen_dir, batch_size)
        else:
            evaluation.generate_wavenet(test_wavs, run_dir, gen_dir, batch_size)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--root", required=True, help="directory containing run dirs")
    parser.add_argument("--test_wavs", required=True, help="wav file or directory")
    parser.add_argument("--results_dir", required=True)
    parser.add_argument("--batch_size", default=4, type=int)
    args = parser.parse_args()
    gather(args.root, args.test_wavs, args.results_dir, args.batch_size)
