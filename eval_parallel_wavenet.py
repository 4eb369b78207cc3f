"""Parallel WaveNet one-shot synthesis CLI
(reference eval_parallel_wavenet.py)."""

from argparse import ArgumentParser

from nsynth_wavenet_tpu import evaluation

if __name__ == "__main__":
    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

    from nsynth_wavenet_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    enable_persistent_cache()
    parser = ArgumentParser()
    parser.add_argument("--source_path", required=True,
                        help="wav/npy file or directory")
    parser.add_argument("--ckpt_dir", required=True,
                        help="student run directory (json + ckpt)")
    parser.add_argument("--save_path", required=True,
                        help="output wav directory")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--sample_length", default=-1, type=int,
                        help="truncate input wavs to this many samples")
    parser.add_argument("--npy_only", action="store_true",
                        help="use only .npy (precomputed mel) inputs")
    parser.add_argument("--pallas", action="store_true",
                        help="serve through the fused flow-stack Pallas "
                             "kernel (models/parallelgen.synthesize_pallas)")
    parser.add_argument("--streaming_chunk", default=None, type=int,
                        help="with --pallas: stream the flows in chunks of "
                             "this many samples with carried state — one "
                             "compiled program serves any utterance length")
    args = parser.parse_args()
    evaluation.generate_parallel_wavenet(
        args.source_path, args.ckpt_dir, args.save_path, args.batch_size,
        args.seed, sample_length=args.sample_length, npy_only=args.npy_only,
        use_pallas=args.pallas, streaming_chunk=args.streaming_chunk,
    )
