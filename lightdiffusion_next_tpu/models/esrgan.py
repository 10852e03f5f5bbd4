"""RRDBNet (ESRGAN / RealESRGAN x4) super-resolution network.

Counterpart of src/UltimateSDUpscale/RDRB.py (+ USDU_upscaler.py:11-60 state
-dict arch rebuild). Supports RealESRGAN new-arch keys (conv_first, body.N.
rdb{1,2,3}.conv{1-5}, conv_body, conv_up1/2, conv_hr, conv_last) and maps
old-arch ESRGAN keys ("model.0", "model.1.sub.N.RDBk.convj.0") onto them at
load. NHWC activations, HWIO kernels (converted by utils.state_dict).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import nn


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _rdb(p: nn.ParamView, x):
    """Residual dense block: 5 convs with dense concat, 0.2 residual scale."""
    x1 = _lrelu(nn.conv2d(x, p("conv1.weight"), p("conv1.bias"), padding=1))
    x2 = _lrelu(
        nn.conv2d(
            jnp.concatenate([x, x1], -1), p("conv2.weight"), p("conv2.bias"), padding=1
        )
    )
    x3 = _lrelu(
        nn.conv2d(
            jnp.concatenate([x, x1, x2], -1),
            p("conv3.weight"),
            p("conv3.bias"),
            padding=1,
        )
    )
    x4 = _lrelu(
        nn.conv2d(
            jnp.concatenate([x, x1, x2, x3], -1),
            p("conv4.weight"),
            p("conv4.bias"),
            padding=1,
        )
    )
    x5 = nn.conv2d(
        jnp.concatenate([x, x1, x2, x3, x4], -1),
        p("conv5.weight"),
        p("conv5.bias"),
        padding=1,
    )
    return x5 * 0.2 + x


def _rrdb(p: nn.ParamView, x):
    out = _rdb(p.scope("rdb1."), x)
    out = _rdb(p.scope("rdb2."), out)
    out = _rdb(p.scope("rdb3."), out)
    return out * 0.2 + x


def num_blocks(params: Dict) -> int:
    n = 0
    while f"body.{n}.rdb1.conv1.weight" in params:
        n += 1
    return n


def apply_rrdbnet(params: Dict, x, scale: int = 4):
    """x: (B, H, W, 3) in [0,1] -> (B, scale*H, scale*W, 3)."""
    fea = nn.conv2d(x, params["conv_first.weight"], params["conv_first.bias"], padding=1)
    trunk = fea
    for i in range(num_blocks(params)):
        trunk = _rrdb(nn.ParamView(params, f"body.{i}."), trunk)
    trunk = nn.conv2d(
        trunk, params["conv_body.weight"], params["conv_body.bias"], padding=1
    )
    fea = fea + trunk
    if scale >= 2:
        fea = nn.interpolate_nearest(fea, 2)
        fea = _lrelu(
            nn.conv2d(fea, params["conv_up1.weight"], params["conv_up1.bias"], padding=1)
        )
    if scale >= 4:
        fea = nn.interpolate_nearest(fea, 2)
        fea = _lrelu(
            nn.conv2d(fea, params["conv_up2.weight"], params["conv_up2.bias"], padding=1)
        )
    fea = _lrelu(nn.conv2d(fea, params["conv_hr.weight"], params["conv_hr.bias"], padding=1))
    return nn.conv2d(fea, params["conv_last.weight"], params["conv_last.bias"], padding=1)


_OLD_ARCH_MAP = [
    (re.compile(r"^model\.0\.(weight|bias)$"), r"conv_first.\1"),
    (
        re.compile(r"^model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d)\.0\.(weight|bias)$"),
        r"body.\1.rdb\2.conv\3.\4",
    ),
    (re.compile(r"^model\.3\.(weight|bias)$"), r"conv_up1.\1"),
    (re.compile(r"^model\.6\.(weight|bias)$"), r"conv_up2.\1"),
    (re.compile(r"^model\.8\.(weight|bias)$"), r"conv_hr.\1"),
    (re.compile(r"^model\.10\.(weight|bias)$"), r"conv_last.\1"),
]

_OLD_TRUNK = re.compile(r"^model\.1\.sub\.(\d+)\.(weight|bias)$")


def normalize_esrgan_keys(sd: Dict) -> Dict:
    """Old-arch ESRGAN -> RealESRGAN naming (USDU_upscaler arch-sniff
    analog). The trunk conv is the HIGHEST-index `model.1.sub.N` entry
    with no RDB segment (N = block count, checkpoint-dependent — 23 for
    x4plus but 16/6-block models exist), detected dynamically."""
    if "conv_first.weight" in sd:
        return dict(sd)
    trunk_idx = max(
        (int(m.group(1)) for m in map(_OLD_TRUNK.match, sd) if m),
        default=None,
    )
    out = {}
    for k, v in sd.items():
        m = _OLD_TRUNK.match(k)
        if m and int(m.group(1)) == trunk_idx:
            out[f"conv_body.{m.group(2)}"] = v
            continue
        for pat, repl in _OLD_ARCH_MAP:
            if pat.match(k):
                out[pat.sub(repl, k)] = v
                break
        else:
            out[k] = v
    return out


class UpscaleModel:
    """UpscaleModelLoader + ImageUpscaleWithModel facade
    (USDU_upscaler.py:11-100): jitted fixed-tile ESRGAN with feathered
    blending (utils.tiling)."""

    def __init__(self, params: Dict, scale: int = 4, dtype=jnp.float32):
        from lightdiffusion_next_tpu.utils import state_dict as sd_utils

        params = normalize_esrgan_keys(params)
        self.scale = scale
        self.params = sd_utils.device_put_params(params, dtype)
        self._apply = jax.jit(lambda p, x: apply_rrdbnet(p, x, self.scale))

    def upscale(self, image, tile: int = 128, overlap: int = 8) -> np.ndarray:
        """image: (B, H, W, 3) [0,1] -> (B, sH, sW, 3), tiled (util.py
        tiled_scale parity, tile 512px/8 overlap in the reference's pixel
        space)."""
        from lightdiffusion_next_tpu.utils import tiling

        out = tiling.tiled_apply_2d(
            lambda t: np.asarray(self._apply(self.params, jnp.asarray(t))),
            np.asarray(image, dtype=np.float32),
            tile=tile,
            overlap=overlap,
            upscale=self.scale,
            out_channels=3,
        )
        return np.clip(out, 0.0, 1.0)


def init_params(num_body: int = 2, nf: int = 64, gc: int = 32, seed: int = 0):
    rng = np.random.default_rng(seed)
    P = {}

    def conv(key, cin, cout):
        P[key + ".weight"] = rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
        P[key + ".bias"] = np.zeros((cout,), np.float32)

    conv("conv_first", 3, nf)
    for i in range(num_body):
        for r in (1, 2, 3):
            for c in range(1, 6):
                cin = nf + gc * (c - 1)
                cout = gc if c < 5 else nf
                conv(f"body.{i}.rdb{r}.conv{c}", cin, cout)
    conv("conv_body", nf, nf)
    conv("conv_up1", nf, nf)
    conv("conv_up2", nf, nf)
    conv("conv_hr", nf, nf)
    conv("conv_last", nf, 3)
    return P
