"""Training CLI — same interface as the reference (train.py:19-46):

    python3 train.py -m MODE -u UPSTREAM -g config_model.yaml
        -c config_runner.yaml -n exp_name [-i ckpt] [-f {10,20}] [--seed N]

MODE in {melhubert, weight-pruning, head-pruning, row-pruning, distillation}.
UPSTREAM in {melhubert, hubert, wav2vec2}.

The reference's --multi_gpu flag (torch DataParallel) is superseded by the
device mesh: all local TPU chips are used for data parallelism automatically;
--model_parallel N additionally shards attention heads / FFN rows.
"""

import argparse
import os
import pathlib
import shutil
import sys

import yaml

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-m", "--mode", required=True,
        choices=["melhubert", "weight-pruning", "head-pruning",
                 "row-pruning", "distillation"],
    )
    parser.add_argument("-u", "--upstream", default="melhubert",
                        choices=["melhubert", "hubert", "wav2vec2"])
    parser.add_argument("-g", "--upstream_config", required=True,
                        help="model YAML")
    parser.add_argument("-c", "--runner_config", required=True,
                        help="runner YAML")
    parser.add_argument("-n", "--expdir", required=True)
    parser.add_argument("-i", "--initial_weight", default=None)
    parser.add_argument("--init_optimizer_from_initial_weight",
                        action="store_true")
    parser.add_argument("-f", "--frame_period", type=int, default=20,
                        choices=[10, 20])
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--backend", default=None,
                        help="jax platform override (e.g. cpu)")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument(
        "--pipeline_parallel", type=int, default=1,
        help="cut the encoder stack into N pipeline stages over a "
        "Mesh((data, pipe)) (GPipe schedule, parallel/pipeline.py). "
        "melhubert pre-train mode only; resume with the same value "
        "(optimizer state is stored over the stage-split tree).",
    )
    parser.add_argument(
        "--pp_microbatches", type=int, default=0,
        help="microbatches per pipeline step (0 = 2 x pipeline_parallel); "
        "train_batch_size must be a multiple of data_parallel x "
        "pp_microbatches",
    )
    parser.add_argument(
        "--multi_host", action="store_true",
        help="join a multi-process run (jax.distributed.initialize; "
        "env-autodetected on Cloud TPU). Run the SAME command on every "
        "host — datasets shard per process, only process 0 writes.",
    )
    return parser.parse_args()


def main():
    args = get_args()
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)
    from speech_ssl_compression_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    primary = True
    if args.multi_host:
        from speech_ssl_compression_tpu.parallel.multihost import (
            initialize,
            is_primary,
        )

        initialize()
        # the "only process 0 writes" contract starts HERE, not in the
        # Runner: expdir creation and provenance copies are writes too
        # (same-content copies race benignly on a shared filesystem, but
        # non-primary processes must not touch the expdir at all)
        primary = is_primary()

    if primary:
        os.makedirs(args.expdir, exist_ok=True)
        # config provenance copies (reference train.py:43-44)
        shutil.copy(args.upstream_config,
                    os.path.join(args.expdir, "config_model.yaml"))
        shutil.copy(args.runner_config,
                    os.path.join(args.expdir, "config_runner.yaml"))

    with open(args.runner_config) as f:
        runner_config = yaml.safe_load(f)
    with open(args.upstream_config) as f:
        upstream_config = yaml.safe_load(f)

    if args.upstream == "melhubert":
        from speech_ssl_compression_tpu.train.runner import Runner

        runner = Runner(args, runner_config, upstream_config)
        runner.train()
    else:
        from speech_ssl_compression_tpu.train.wave_runner import WaveRunner

        runner = WaveRunner(args, runner_config, upstream_config)
        runner.train()


if __name__ == "__main__":
    main()
