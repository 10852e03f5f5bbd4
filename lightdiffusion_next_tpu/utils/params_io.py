"""Prompt/parameter file IO (util.py:324-369 parity).

In the reference this pair backs the prompt-enhancer flow only
(Enhancer.py:18 reads the prompt back from ./include/prompt.txt). Its
writer is buggy: the prompt and negative lines are written WITHOUT
trailing newlines, so its own loader cannot parse what it wrote
("prompt: X" "neg: Y" and "w: N" all land on one line). Here the file is
written correctly; the loader also tolerates the reference's broken
single-line files by only splitting on the FIRST ': '.
"""

from __future__ import annotations

import os
from typing import Tuple

from lightdiffusion_next_tpu import config as _config


def _params_file() -> str:
    return os.path.join(_config.asset_root(), "prompt.txt")


def write_parameters_to_file(
    prompt_entry: str, neg: str, width: int, height: int, cfg: int
) -> None:
    os.makedirs(os.path.dirname(_params_file()), exist_ok=True)
    with open(_params_file(), "w") as f:
        f.write(f"prompt: {prompt_entry}\n")
        f.write(f"neg: {neg}\n")
        f.write(f"w: {int(width)}\n")
        f.write(f"h: {int(height)}\n")
        f.write(f"cfg: {int(cfg)}\n")


def load_parameters_from_file() -> Tuple[str, str, int, int, int]:
    with open(_params_file()) as f:
        parameters = {}
        for line in f:
            if not line.strip():
                continue
            key, _, value = line.partition(": ")
            parameters[key.strip()] = value.strip()
    return (
        parameters["prompt"],
        parameters["neg"],
        int(parameters["w"]),
        int(parameters["h"]),
        int(parameters["cfg"]),
    )
