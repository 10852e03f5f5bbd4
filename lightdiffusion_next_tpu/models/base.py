"""Diffusion model packaging: net + parameterization + latent format.

Counterpart of src/Model/ModelBase.py (BaseModel/BASE) and the loader glue.
A ``DiffusionModel`` is an immutable bundle: pure apply function, flat param
pytree, model_sampling object, latent format, and static net config. "Model
patching" (LoRA, wrappers) produces NEW bundles — never mutates (the
ModelPatcher clone-on-write machinery, src/Model/ModelPatcher.py:18-779,
reduces to dict arithmetic over params).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.sampling import model_sampling as ms_mod
from lightdiffusion_next_tpu.utils import latent as latent_mod


# Monotonic model identity for compiled-runner cache keys. id()-based keys
# can alias when an object dies and a new one lands on the recycled address;
# a counter never repeats within a process, so a runner traced for a dead
# model can never be keyed the same as a new model's.
_UID_COUNTER = itertools.count(1)


@dataclasses.dataclass
class DiffusionModel:
    apply_fn: Callable  # (params, x, t, context, y=None, **extra) -> out
    params: Dict[str, Any]
    model_sampling: Any
    latent_format: latent_mod.LatentFormat
    config: Any = None
    model_type: str = "unet"  # "unet" | "flux"
    model_options: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # Trace identity: changes whenever the traced program would (new load,
    # new apply_fn/config variant); stays fixed across with_params/with_options
    # because params/conds travel as jit ARGUMENTS, not trace constants.
    uid: Optional[int] = None

    def __post_init__(self):
        if self.uid is None:
            self.uid = next(_UID_COUNTER)

    def with_params(self, params) -> "DiffusionModel":
        return dataclasses.replace(self, params=params)

    def with_options(self, **opts) -> "DiffusionModel":
        new = dict(self.model_options)
        new.update(opts)
        return dataclasses.replace(self, model_options=new)

    def memory_required_bytes(self, shape) -> int:
        """Rough activation estimate (ModelBase.memory_required analog,
        ModelBase.py:226-244) — informational only on TPU."""
        b, h, w, c = shape
        dtype_size = jnp.dtype(jnp.bfloat16).itemsize
        area = b * h * w
        return int(dtype_size * area * c * 16 * 64)


def sd15_model(
    params: Dict[str, Any],
    cfg: Optional[unet_mod.UNetConfig] = None,
    dtype=jnp.float32,
) -> DiffusionModel:
    """Assemble an SD1.5-class EPS UNet bundle (sm_SD15, SD15/SD15.py:10)."""
    cfg = cfg or dataclasses.replace(unet_mod.SD15_CONFIG, dtype=dtype)
    plan = unet_mod.build_plan(cfg)

    def apply_fn(p, x, t, context, y=None, attn1_override=None,
                 first_block_hook=None, **_):
        return unet_mod.apply_unet(
            p, x, t, context, y=y, cfg=cfg, plan=plan,
            attn1_override=attn1_override, first_block_hook=first_block_hook,
        )

    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    return DiffusionModel(
        apply_fn=apply_fn,
        params=sd_utils.device_put_params(params, dtype),
        model_sampling=ms_mod.ModelSamplingDiscrete(),
        latent_format=latent_mod.SD15,
        config=cfg,
        model_type="unet",
    )
