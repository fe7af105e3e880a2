"""Offline preprocessing CLI (capability match for reference preprocess.sh +
preprocess/tidy_libri{360,960}_kaldi_data.py):

    python3 preprocess.py <kaldi_data_dir> <out_dir> [--hours {360,960}]

Optionally un-tars the release first with --tar PATH (like preprocess.sh).
"""

import argparse
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from speech_ssl_compression_tpu.data.preprocess import tidy_kaldi_data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir")
    p.add_argument("out_dir")
    p.add_argument("--hours", type=int, choices=[360, 960], default=960)
    p.add_argument("--tar", default=None,
                   help="release tarball to unpack into data_dir first")
    p.add_argument("--num-cluster", type=int, default=512)
    args = p.parse_args()

    if args.tar:
        pathlib.Path(args.data_dir).mkdir(parents=True, exist_ok=True)
        subprocess.run(["tar", "-xf", args.tar, "-C", args.data_dir],
                       check=True)

    name = f"train-{args.hours}"
    tidy_kaldi_data(
        args.data_dir,
        args.out_dir,
        feat_scp=f"fbank/{name}.scp",
        mean_var=f"fbank/{name}.mean-var",
        label_scp_name=f"train_{args.hours}.hubert8.bas.scp",
        num_cluster=args.num_cluster,
        csv_prefix=f"libri{args.hours}-stg2",
    )
    print(f"[Preprocess] wrote features/labels/CSVs to {args.out_dir}")


if __name__ == "__main__":
    main()
