"""Export a framework .npz checkpoint as a reference-format torch .ckpt
(torch.save dict with 'model' state dict + self-describing metadata), so
reference tooling and its S3PRL adapter can consume models trained here.

Run: python tools/export_torch_ckpt.py in.npz out.ckpt
"""

import json
import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from speech_ssl_compression_tpu.utils.checkpoint import load_checkpoint  # noqa: E402
from speech_ssl_compression_tpu.utils.torch_convert import (  # noqa: E402
    params_to_state_dict,
)


def main():
    src, dst = sys.argv[1], sys.argv[2]
    state = load_checkpoint(src)
    sd_np = params_to_state_dict(state["params"], state["masks"])
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}

    meta = state["meta"]
    all_states = {
        "model": sd,
        "Upstream_Config": meta.get("Upstream_Config", {}),
        "Step": meta.get("Step", 0),
        "Args": meta.get("Args", {}),
        "Runner": meta.get("Runner", {}),
    }
    if "Pruned_heads" in meta:
        # JSON round-trips dict keys as strings; restore ints
        all_states["Pruned_heads"] = [
            {int(k): v for k, v in event.items()}
            for event in meta["Pruned_heads"]
        ]
    if "Pruning" in meta:
        all_states["Pruning"] = meta["Pruning"]
    if "TotalStep" in meta:
        all_states["TotalStep"] = meta["TotalStep"]

    torch.save(all_states, dst)
    print(f"wrote {dst}: {len(sd)} tensors, keys "
          f"{sorted(k for k in all_states if k != 'model')}")


if __name__ == "__main__":
    main()
