"""Mesh construction over ICI."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """("data", "model") mesh. data*model must divide the device count;
    with -1 for one axis, it absorbs the remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data == -1 and model == -1:
        raise ValueError("only one mesh axis may be -1")
    if data == -1:
        data = n // model
    if model == -1:
        model = n // data
    if data < 1 or model < 1:
        raise ValueError(f"invalid mesh {data}x{model} for {n} devices")
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    if data * model < n:
        import logging

        logging.getLogger(__name__).warning(
            "mesh %dx%d uses %d of %d devices", data, model, data * model, n
        )
    devs = devs[: data * model]
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
