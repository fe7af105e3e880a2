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
        # reference preprocess.sh:7-8 flattens the 960h release's nested
        # 20 ms cluster split before tidying; without it the 20 ms label
        # scp is missing and the labels/CSV silently never get written
        split = pathlib.Path(args.data_dir) / "stage2-cluster-20ms" / "split200"
        if split.is_dir():
            for item in split.iterdir():
                item.rename(split.parent / item.name)
            split.rmdir()

    if args.hours == 960:
        # 960h release layout (reference tidy_libri960_kaldi_data.py:31-35)
        tidy_kaldi_data(
            args.data_dir,
            args.out_dir,
            feat_scp="fbank/train-960.scp",
            mean_var="fbank/train-960.mean-var",
            label_scp_name="train_960.hubert8.bas.scp",
            num_cluster=args.num_cluster,
            csv_prefix="libri960-stg2",
        )
    else:
        # 360h release stores everything at the data_dir root under
        # train-clean-360.* names (reference tidy_libri360_kaldi_data.py:29-37)
        tidy_kaldi_data(
            args.data_dir,
            args.out_dir,
            feat_scp="train-clean-360.scp",
            mean_var="train-clean-360.mean-var",
            cluster_dirs={"20ms": "."},
            label_scp_name="train-clean-360-k512-e10.bas.scp",
            num_cluster=args.num_cluster,
            csv_prefix="libri-360-data-cluster-pair",
        )
    print(f"[Preprocess] wrote features/labels/CSVs to {args.out_dir}")


if __name__ == "__main__":
    main()
