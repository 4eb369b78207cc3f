"""Teacher WaveNet batch synthesis CLI (reference eval_wavenet.py)."""

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
                        help="teacher run directory (json + ckpt)")
    parser.add_argument("--save_path", required=True,
                        help="output wav directory")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--sample_length", default=-1, type=int,
                        help="truncate input wavs to this many samples")
    parser.add_argument("--npy_only", action="store_true",
                        help="use only .npy (precomputed mel) inputs")
    parser.add_argument("--pallas", action="store_true",
                        help="serve through the fused Pallas kernel")
    parser.add_argument("--streaming_chunk", default=0, type=int,
                        help="with --pallas: chunk size in samples; one "
                             "compiled kernel then serves any utterance "
                             "length (0 = off, compile per length)")
    parser.add_argument("--int8", action="store_true",
                        help="with --pallas: stream W8A8 int8 weights (the "
                             "fastest serving mode; quality-gated by "
                             "tools/quality_smoke.py --compare_pallas)")
    parser.add_argument("--int8_static", action="store_true",
                        help="with --int8: static per-layer activation "
                             "scales calibrated on the first source wavs "
                             "(fewer VPU passes per step; needs .wav inputs)")
    args = parser.parse_args()
    evaluation.generate_wavenet(
        args.source_path, args.ckpt_dir, args.save_path, args.batch_size,
        args.seed, use_pallas=args.pallas,
        sample_length=args.sample_length, npy_only=args.npy_only,
        streaming_chunk=args.streaming_chunk or None, int8=args.int8,
        int8_static=args.int8_static,
    )
