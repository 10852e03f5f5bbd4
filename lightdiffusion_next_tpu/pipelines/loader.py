"""Checkpoint loading: one-file SD checkpoint -> (model, clip, vae) with
architecture guessing and a session model cache.

Counterpart of src/FileManaging/Loader.py:11-156
(load_checkpoint_guess_config / CheckpointLoaderSimple) and
src/Device/ModelCache.py (session-lifetime cache). GGUF diffusion models
load via pipelines.loader.load_diffusion_model_gguf
(UnetLoaderGGUF parity, src/Quantize/Quantizer.py:764-812).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from lightdiffusion_next_tpu import config as _config
from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.models import vae as vae_mod
from lightdiffusion_next_tpu.models.clip import facade as clip_facade
from lightdiffusion_next_tpu.sampling import model_sampling as ms_mod
from lightdiffusion_next_tpu.utils import latent as latent_mod
from lightdiffusion_next_tpu.utils import state_dict as sd_utils


def load_checkpoint_guess_config(
    ckpt_path: str,
    embedding_directory: Optional[str] = None,
    dtype=None,
) -> Tuple[base_mod.DiffusionModel, clip_facade.CLIP, vae_mod.VAE]:
    """Loader.load_checkpoint_guess_config parity (Loader.py:11-113)."""
    cfgv = _config.get_config()
    dtype = dtype or cfgv.dtypes.param_dtype
    sd = sd_utils.load_torch_file(ckpt_path)
    unet_sd, clip_sd, vae_sd = sd_utils.split_checkpoint(sd)
    if not unet_sd:
        raise RuntimeError(f"no diffusion model weights in {ckpt_path}")

    model_type = sd_utils.detect_model_type(unet_sd)
    if model_type != "unet":
        raise RuntimeError("one-file flux checkpoints not supported; use GGUF")

    unet_cfg = sd_utils.detect_unet_config(unet_sd)
    unet_cfg = dataclasses.replace(unet_cfg, dtype=cfgv.dtypes.compute_dtype)
    unet_sd = sd_utils.convs_to_hwio(unet_sd)
    model = base_mod.sd15_model(unet_sd, cfg=unet_cfg, dtype=dtype)

    vae = vae_mod.VAE(
        sd_utils.convs_to_hwio(vae_sd),
        cfg=vae_mod.detect_vae_config(vae_sd),
        dtype=cfgv.dtypes.vae_dtype,
    )
    clip = clip_facade.sd1_clip_from_state_dict(
        clip_sd,
        embedding_directory=embedding_directory,
        dtype=cfgv.dtypes.text_encoder_dtype,
    )
    return model, clip, vae


def _load_flux_scan_host(sd, fcfg, cfgv, w8a8: bool):
    """Host-prep load for the scan-over-blocks forward: transpose to the
    fused layout on host, permute the RoPE basis on host (if fused_attn
    applies), np.stack the block families on host, upload the ~30 stacked
    buffers, then (optionally) requant to W8A8 on device — the stacked
    lax.map requant donates its codes, so no small-buffer churn ever
    reaches the device heap (the HBM-fragmentation OOM fix; see
    models.flux.stack_block_params_host). Returns the device param dict,
    or None if this checkpoint cannot stack (caller falls back to the
    unrolled device path)."""
    import logging

    from lightdiffusion_next_tpu.ops import ggml

    host = ggml.to_device_quantized(
        sd, dtype=cfgv.dtypes.param_dtype, device=False
    )
    if cfgv.resolve_fused_attn():
        if fcfg.head_dim != 128:
            logging.getLogger(__name__).warning(
                "fused_attn kernel is 128-lane head_dim only (got %d); "
                "keeping the unfused attention path", fcfg.head_dim,
            )
        else:
            try:
                host = flux_mod.permute_rope_basis(host, fcfg, device=False)
            except ValueError as e:
                logging.getLogger(__name__).warning(
                    "flux_scan host prep unavailable (%s); falling back "
                    "to the unrolled load path", e,
                )
                return None
    try:
        params = flux_mod.stack_block_params_host(host, fcfg)
    except ValueError as e:
        logging.getLogger(__name__).warning(
            "flux_scan unavailable for this checkpoint (%s); falling "
            "back to the unrolled load path", e,
        )
        return None
    if w8a8:
        params = ggml.to_w8a8(params)
    return params


def load_diffusion_model_gguf(
    path: str, mesh=None, w8a8: Optional[bool] = None,
    scan_blocks: Optional[bool] = None, spmd: bool = False,
) -> base_mod.DiffusionModel:
    """Flux GGUF -> quantized DiffusionModel (UnetLoaderGGUF parity).

    With ``mesh`` (a ("data","model") jax.sharding.Mesh), params are laid
    out tensor-parallel per parallel.sharding.flux_param_spec as they are
    uploaded — each chip only ever holds its shard (the 12B Q8_0 weights
    are ~13 GB; one v5e chip has 16 GB).

    ``w8a8`` (default: config.w8a8) requantizes the fused matmul weights
    per-column on device after upload for the int8-MXU compute path
    (ops.ggml.QTensor8W).

    ``scan_blocks`` (default: config.resolve_flux_scan() — TPU on) stacks
    the DiT block params
    for the scan-over-blocks forward (models.flux.stack_block_params) —
    7.2x less HLO to compile. Single-device only at the loader level;
    ignored (with a log)
    when a mesh is given.

    ``spmd``: the caller will wrap the mesh-loaded model in the shard_map
    TP forward (parallel.spmd.to_spmd_model). Fused-prologue attention
    then composes: the RoPE basis is permuted on the host BEFORE the TP
    interleave (the two permutations commute — parallel.layout.
    permute_rope_basis_rows) and ``fused_attn`` is set on the config, so
    each shard runs the fused kernel over its whole local heads. GSPMD
    mesh loads (spmd=False) keep the unfused path (a Pallas call cannot
    run under GSPMD partitioning)."""
    from lightdiffusion_next_tpu.ops import ggml

    cfgv = _config.get_config()
    sd = ggml.gguf_sd_loader(path)
    if "double_blocks.0.img_attn.qkv.weight" not in sd:
        raise RuntimeError(f"{path} is not a Flux GGUF")
    fcfg = flux_mod.detect_config(sd, dtype=cfgv.dtypes.compute_dtype)
    sharding_for = None
    if mesh is not None:
        from lightdiffusion_next_tpu.parallel import layout
        from lightdiffusion_next_tpu.parallel import sharding as shard_rules

        spmd_fused = False
        if cfgv.resolve_fused_attn() and spmd:
            import logging

            tp = mesh.shape.get("model", 1)
            if fcfg.head_dim != 128:
                logging.getLogger(__name__).warning(
                    "fused_attn kernel is 128-lane head_dim only (got %d);"
                    " keeping the unfused attention path", fcfg.head_dim,
                )
            elif tp and fcfg.num_heads % tp:
                # same divisibility check make_spmd_apply_fn enforces —
                # validated HERE so the permute never lands on weights the
                # shard_map wrap would then refuse (permuted weights
                # require the fused kernel)
                logging.getLogger(__name__).warning(
                    "fused_attn needs num_heads %% tp == 0 (%d %% %d); "
                    "keeping the unfused attention path", fcfg.num_heads, tp,
                )
            else:
                try:
                    sd = layout.permute_rope_basis_rows(sd, fcfg)
                    spmd_fused = True
                except ValueError as e:
                    logging.getLogger(__name__).warning(
                        "fused_attn unavailable for this checkpoint (%s); "
                        "keeping the unfused attention path", e,
                    )

        # TP layout on the host state dict (cheap row permutes of the
        # row-major QTensor8 leaves) so each chip's shard holds whole
        # attention heads — see parallel.layout
        sd, fcfg = layout.to_tp_layout(sd, fcfg)
        if spmd_fused:
            fcfg = dataclasses.replace(fcfg, fused_attn=True)
        sharding_for = shard_rules.flux_sharding_for(sd, mesh)

    if w8a8 is None:
        w8a8 = cfgv.resolve_w8a8()
    if scan_blocks is None:
        scan_blocks = cfgv.resolve_flux_scan()

    if scan_blocks and mesh is None:
        # Scan-over-blocks host-prep path: permute + stack in host numpy
        # and upload only the ~30 big stacked buffers — the device-side
        # upload->requant->permute->stack order frees ~700 small leaves
        # between 0.5-2.5 GB stack allocations and fragments HBM enough
        # to OOM the scan program at execution on a 16 GB chip (round-4
        # finding, scripts/probe_flux_memory.py --exec). w8a8 still runs
        # on device (stacked lax.map requant, donating, bit-identical).
        params = _load_flux_scan_host(sd, fcfg, cfgv, w8a8)
        if params is not None:
            fused = cfgv.resolve_fused_attn() and fcfg.head_dim == 128
            if fused:
                fcfg = dataclasses.replace(fcfg, fused_attn=True)
            return base_mod.DiffusionModel(
                apply_fn=flux_mod.make_apply_fn(fcfg),
                params=params,
                model_sampling=ms_mod.ModelSamplingFlux(),
                latent_format=latent_mod.FLUX1,
                config=fcfg,
                model_type="flux",
            )
        # host prep refused (ragged families / LoRA-patched leaves):
        # fall through to the device path, which re-warns and serves the
        # unrolled forward

    params = ggml.to_device_quantized(
        sd, dtype=cfgv.dtypes.param_dtype, sharding_for=sharding_for
    )
    if w8a8:
        if mesh is not None:
            # tp leaves pass through to_w8a8 unconverted: the sharded
            # path never takes the single-device int8 kernel, so w8a8
            # would trade per-column rounding for zero compute gain
            import logging

            logging.getLogger(__name__).warning(
                "w8a8 has no effect on a tensor-parallel Flux load; "
                "keeping Q8_0 block-scale weights"
            )
        params = ggml.to_w8a8(params)

    if cfgv.resolve_fused_attn():
        import logging

        if mesh is not None:
            if not fcfg.fused_attn:
                logging.getLogger(__name__).warning(
                    "fused_attn requires the shard_map TP forward on a "
                    "mesh (LDT_FLUX_TP=spmd); keeping the unfused "
                    "attention path on this GSPMD load"
                )
        elif fcfg.head_dim != 128:
            logging.getLogger(__name__).warning(
                "fused_attn kernel is 128-lane head_dim only (got %d); "
                "keeping the unfused attention path", fcfg.head_dim,
            )
        else:
            try:
                # after to_w8a8 so the permute hits the final leaf form
                params = flux_mod.permute_rope_basis(params, fcfg)
                fcfg = dataclasses.replace(fcfg, fused_attn=True)
            except ValueError as e:
                logging.getLogger(__name__).warning(
                    "fused_attn unavailable for this checkpoint (%s); "
                    "keeping the unfused attention path", e,
                )

    if scan_blocks:
        if mesh is not None:
            import logging

            logging.getLogger(__name__).warning(
                "flux_scan does not apply to a GSPMD tensor-parallel load; "
                "keeping the unrolled forward (use LDT_FLUX_TP=spmd — "
                "parallel.spmd.to_spmd_model stacks the sharded blocks)"
            )
        else:
            # stack AFTER the w8a8 conversion so the stacked leaves carry
            # the final quantization form (StackedQTensor8W vs 8T)
            try:
                params = flux_mod.stack_block_params(params, fcfg)
            except ValueError as e:
                # e.g. a checkpoint with non-uniform block families; keep
                # serving on the unrolled forward (stack_block_params
                # validates before consuming, so params is intact here)
                import logging

                logging.getLogger(__name__).warning(
                    "flux_scan unavailable for this checkpoint (%s); "
                    "keeping the unrolled forward", e,
                )

    return base_mod.DiffusionModel(
        apply_fn=flux_mod.make_apply_fn(fcfg),
        params=params,
        model_sampling=ms_mod.ModelSamplingFlux(),
        latent_format=latent_mod.FLUX1,
        config=fcfg,
        model_type="flux",
    )


# ---------------------------------------------------------------------------
# Session model cache (ModelCache.py parity)
# ---------------------------------------------------------------------------


class ModelCache:
    """Keeps (model, clip, vae) resident between generations keyed by
    checkpoint path+mtime (src/Device/ModelCache.py:11-169). On TPU this
    holds host/device pytrees; there is no VRAM paging to manage."""

    def __init__(self):
        self._cache: Dict[str, Tuple] = {}
        self.keep_models_loaded = True

    def _key(self, path: str, variant: str = "") -> str:
        try:
            base = f"{os.path.abspath(path)}:{os.path.getmtime(path)}"
        except OSError:
            base = os.path.abspath(path)
        return f"{base}::{variant}" if variant else base

    def get(self, path: str, variant: str = ""):
        """``variant`` distinguishes differently-laid-out residents of the
        same file (e.g. a TP-sharded model) while keeping the mtime-based
        staleness check on the real path."""
        if not self.keep_models_loaded:
            return None
        return self._cache.get(self._key(path, variant))

    def put(self, path: str, value, variant: str = "") -> None:
        if self.keep_models_loaded:
            self._cache[self._key(path, variant)] = value

    def evict_other_variants(self, path: str, keep_variant: str = "") -> None:
        """Drop every OTHER variant of ``path`` before loading a new one:
        two 12B Flux variants (e.g. Q8_0 and w8a8, or GSPMD and spmd)
        resident together is ~26 GB of int8 codes against one 16 GB chip.
        Mirrors the reference evicting on checkpoint switch
        (ModelCache.py:34-62 keeps exactly one model per slot)."""
        try:
            base = f"{os.path.abspath(path)}:"
        except Exception:
            return
        keep = self._key(path, keep_variant)
        for k in [k for k in self._cache if k.startswith(base) and k != keep]:
            del self._cache[k]

    def clear(self) -> None:
        self._cache.clear()

    def set_keep_models_loaded(self, keep: bool) -> None:
        self.keep_models_loaded = keep
        if not keep:
            self.clear()

    def get_memory_info(self) -> Dict:
        """UI memory panel data (ModelCache.get_memory_info parity)."""
        import jax

        info = {"cached_models": len(self._cache)}
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                info["bytes_in_use"] = stats.get("bytes_in_use", 0)
                info["bytes_limit"] = stats.get("bytes_limit", 0)
        except Exception:
            pass
        return info


_model_cache: Optional[ModelCache] = None


def get_model_cache() -> ModelCache:
    global _model_cache
    if _model_cache is None:
        _model_cache = ModelCache()
    return _model_cache


class CheckpointLoaderSimple:
    """CheckpointLoaderSimple node parity (Loader.py:114-156)."""

    def load_checkpoint(self, ckpt_path: str, embedding_directory=None):
        cache = get_model_cache()
        # the CLIP's textual-inversion set is resolved against the
        # embedding directory at build time — a resident built for one
        # directory must not serve another
        variant = f"emb={embedding_directory}" if embedding_directory else ""
        hit = cache.get(ckpt_path, variant)
        if hit is not None:
            return hit
        out = load_checkpoint_guess_config(
            ckpt_path, embedding_directory=embedding_directory
        )
        cache.put(ckpt_path, out, variant)
        return out
