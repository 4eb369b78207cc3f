"""Dataset builder CLI: wav dir -> mmap'd {data.bin, index.json}
(reference build_dataset.py, which wrote a TFRecord)."""

from argparse import ArgumentParser

from nsynth_wavenet_tpu.data import dataset

if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--wave_dir", required=True, help="input wave directory")
    parser.add_argument("--save_path", required=True, help="output dataset directory")
    parser.add_argument("--sample_rate", default=16000, type=int)
    parser.add_argument("--min_len", default=16000, type=int,
                        help="minimum length for padding")
    parser.add_argument("--num_workers", default=10, type=int)
    args = parser.parse_args()
    dataset.build_dataset(
        args.wave_dir, args.save_path, args.sample_rate, args.min_len, args.num_workers
    )
