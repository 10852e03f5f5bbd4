"""shard_map tensor-parallel Flux forward — explicit-collective TP.

The GSPMD TP path (parallel/inference.py) partitions the dequant+dot
fallback: inside jit the QTensor8T/QTensor8W leaves carry tp=True, the
single-device Pallas kernels are bypassed, and XLA inserts the Megatron
all-reduces from the param shardings. Correct, but it forfeits the fused
int8 kernels (ops/quant_matmul) that make the single-chip path fast.

This module runs the SAME Megatron math under jax.shard_map instead:
each device's body sees its LOCAL weight shards as ordinary arrays
(tp=False), so every matmul routes through the fused Q8_0 / W8A8 Pallas
kernels, and the row-parallel partial sums are completed by the explicit
``jax.lax.psum`` calls `models/flux.py` emits when ``FluxConfig.tp_axis``
is set (one per stream per double block, one per single block — exactly
the collective structure tests/test_tp_collectives.py pins for GSPMD).

Requires the TP-aligned layout (parallel.layout.to_tp_layout): qkv rows
head-interleaved so shards hold whole heads, single-block linear1/linear2
de-fused so shard boundaries never cross the attn/mlp seam.

Kernel-coverage caveat at tp=8 on real Flux (hidden=3072): row-parallel
shards have K_local = 384, below the Q8_0 kernel's 256-multiple K
constraint (scale-block sublanes), so attn.proj/linear2 fall back to
dequant+dot under Q8_0 — ~10% of DiT FLOPs. The W8A8 kernel has no
scale-block constraint (K granule 128, quant_matmul.supported_w8a8) and
keeps the fused path everywhere; prefer --w8a8 with spmd at tp=8.
tp=2/4 (K_local 1536/768) is fully covered in both modes.

The reference has no distributed backend at all (SURVEY §5); this is the
TPU-native design for >1 chip per image.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import ggml
from lightdiffusion_next_tpu.parallel import sharding as shard_rules


def _qt_spec(spec):
    """Physical (K, N) partition spec for a logically (out=N, in=K)-spec'd
    quantized weight (the fused layout stores codes transposed)."""
    if spec == P("model", None):
        return P(None, "model")
    if spec == P(None, "model"):
        return P("model", None)
    return P()


def _cs_spec(spec):
    """Partition spec for W8A8 (1, N) col_scales given the logical weight
    spec: sharded with the out dim when column-parallel, replicated when
    row-parallel (every shard applies the same full-N scales after psum)."""
    return P(None, "model") if spec == P("model", None) else P()


def _leaf_specs(key: str, leaf):
    """Per-leaf PartitionSpecs for one param entry, in the pytree
    structure of the leaf itself (so the resulting dict is a valid
    shard_map in_specs tree). Mirrors parallel.sharding._quantized_sharding
    but yields PartitionSpecs instead of NamedShardings."""
    spec = shard_rules.flux_param_spec(key)
    if isinstance(leaf, ggml.QTensorLoRA):
        # the low-rank factors must shard WITH the base: a column-parallel
        # base produces a local (.., N/tp) output, so ``up`` rows (out dim)
        # shard along "model" (rows are already in the layout keyspace —
        # to_tp_layout_patches permuted them with the qkv interleave); a
        # row-parallel base consumes a local (.., K/tp) input, so ``down``
        # cols shard and the correction is a partial folded into the psum.
        if spec == P("model", None):
            up_s, down_s = P("model", None), P()
        elif spec == P(None, "model"):
            up_s, down_s = P(), P(None, "model")
        else:
            up_s, down_s = P(), P()
        return ggml.QTensorLoRA(
            base=_leaf_specs(key, leaf.base), up=up_s, down=down_s
        )
    if isinstance(leaf, ggml.QTensor8W):
        return ggml.QTensor8W(
            qt=_qt_spec(spec), col_scales=_cs_spec(spec),
            shape=leaf.shape, tp=False,
        )
    if isinstance(leaf, ggml.QTensor8T):
        qs = _qt_spec(spec)
        return ggml.QTensor8T(qt=qs, scales_t=qs, shape=leaf.shape, tp=False)
    return spec


def _lead(spec) -> P:
    """Prefix a PartitionSpec with the (replicated) stack depth axis."""
    return P(*((None,) + tuple(spec)))


def _stack_rep_key(stack_key: str, rel: str) -> str:
    """Representative flat param key for a stacked family member, e.g.
    ('__double_stack__', 'img_attn.qkv.weight') ->
    'double_blocks.0.img_attn.qkv.weight' — flux_param_spec is keyed by
    flat names and every block shares one spec."""
    head = ("double_blocks.0."
            if stack_key == flux_mod.DOUBLE_STACK_KEY else "single_blocks.0.")
    return head + rel


def _stacked_leaf_specs(rep_key: str, leaf):
    """_leaf_specs for scan-mode stacked leaves: the per-block spec with a
    replicated leading depth axis."""
    spec = shard_rules.flux_param_spec(rep_key)
    if isinstance(leaf, ggml.StackedQTensor8T):
        qs = _lead(_qt_spec(spec))
        return ggml.StackedQTensor8T(
            qt3=qs, scales3=qs, shape=leaf.shape, tp=False
        )
    if isinstance(leaf, ggml.StackedQTensor8W):
        cs = _cs_spec(spec)
        return ggml.StackedQTensor8W(
            qt3=_lead(_qt_spec(spec)),
            col_scales3=_lead(cs) if len(cs) else P(),
            shape=leaf.shape,
            tp=False,
        )
    return _lead(spec)


def flux_tp_in_specs(params: Dict) -> Dict:
    """shard_map in_specs pytree for a TP-laid-out Flux param dict
    (scan-mode stacked sub-dicts included)."""
    out = {}
    for k, v in params.items():
        if k in (flux_mod.DOUBLE_STACK_KEY, flux_mod.SINGLE_STACK_KEY):
            out[k] = {
                rel: _stacked_leaf_specs(_stack_rep_key(k, rel), leaf)
                for rel, leaf in v.items()
            }
        else:
            out[k] = _leaf_specs(k, v)
    return out


def _local_view(params: Dict, tp: int) -> Dict:
    """Rebuild quantized leaves with tp=False and the LOCAL logical shape
    so the shard_map body routes them through the single-device fused
    kernels. Arrays are untouched (no copies) — only the static aux data
    changes. The local shape divides the sharded dim by ``tp`` per
    flux_param_spec (column-parallel: out/tp; row-parallel: in/tp)."""

    def conv(key, v):
        spec = shard_rules.flux_param_spec(key)
        if isinstance(v, ggml.QTensorLoRA):
            return ggml.QTensorLoRA(
                base=conv(key, v.base), up=v.up, down=v.down
            )
        if isinstance(
            v,
            (ggml.QTensor8T, ggml.QTensor8W,
             ggml.StackedQTensor8T, ggml.StackedQTensor8W),
        ):
            out_d, in_d = v.shape
            if spec == P("model", None):
                shape = (out_d // tp, in_d)
            elif spec == P(None, "model"):
                shape = (out_d, in_d // tp)
            else:
                shape = v.shape
            return dataclasses.replace(v, shape=shape, tp=False)
        return v

    out = {}
    for k, v in params.items():
        if k in (flux_mod.DOUBLE_STACK_KEY, flux_mod.SINGLE_STACK_KEY):
            out[k] = {
                rel: conv(_stack_rep_key(k, rel), leaf)
                for rel, leaf in v.items()
            }
        else:
            out[k] = conv(k, v)
    return out


def make_spmd_apply_fn(cfg: flux_mod.FluxConfig, mesh: Mesh, axis: str = "model"):
    """Build (apply_fn, local_view_fn) for the shard_map TP forward.

    ``apply_fn(local_params, x, t, context, y, guidance=..., first_block_hook=...)``
    matches DiffusionModel.apply_fn's signature; pass it params through
    ``local_view_fn`` (same sharded arrays, local aux). Activations are
    replicated over the mesh; the output is replicated (every chip holds
    the full denoised tokens, as the sampler expects)."""
    if not cfg.tp_layout:
        raise ValueError(
            "the shard_map TP forward requires the TP-aligned layout "
            "(load with parallel.layout.to_tp_layout / loader mesh=...)"
        )
    tp = mesh.shape[axis]
    if cfg.num_heads % tp:
        raise ValueError(f"num_heads {cfg.num_heads} not divisible by tp={tp}")
    lcfg = dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp, tp_axis=axis
    )
    rep = P()  # replicated over every mesh axis
    # batch shards over the "data" axis when the mesh has one >1 (dp x tp
    # serving: each data-row of chips denoises its own sub-batch; the tp
    # psums stay within the row). Pure-TP meshes (data=1) reduce to
    # replicated activations.
    data_axis = "data" if mesh.shape.get("data", 1) > 1 else None
    act = P(data_axis) if data_axis else rep
    n_data = mesh.shape.get("data", 1)

    def apply_fn(p, x, t, context, y=None, guidance=None,
                 first_block_hook=None, **_):
        b = x.shape[0]
        if y is None:
            y = jnp.zeros((b, cfg.vec_in_dim), jnp.float32)
        if guidance is None and cfg.guidance_embed:
            guidance = jnp.full((b,), 3.5, dtype=jnp.float32)
        if data_axis and b % n_data:
            raise ValueError(
                f"batch {b} not divisible by data-axis size {n_data}"
            )

        # Stateful hooks (FBCache) communicate their new scan state through
        # a mutable box (fbcache.make_hook, hook.state_box). Values written
        # inside the shard_map body are BODY tracers — the body must return
        # them explicitly and we re-stash the legit outer value after.
        box = getattr(first_block_hook, "state_box", None)
        if box is not None and data_axis:
            # the FBCache state carries whole-batch SCALAR decisions
            # (consecutive_hits/valid) that diverge across data shards —
            # ill-defined to reassemble; keep dp x tp to stateless hooks
            raise ValueError(
                "stateful first_block_hook (FBCache) is not supported on a "
                "dp x tp spmd mesh; use a pure-TP (1, N) mesh or disable "
                "FBCache"
            )

        in_specs = (flux_tp_in_specs(p), act, act, act, act)
        args = (p, x, t, context, y)
        if cfg.guidance_embed:  # guidance rides as an extra positional
            in_specs = in_specs + (act,)
            args = args + (guidance,)

        def body(pp, xx, tt, cc, yy, *rest):
            out = flux_mod.apply_flux(
                pp, xx, tt, cc, yy,
                guidance=rest[0] if rest else None,
                cfg=lcfg,
                first_block_hook=first_block_hook,
            )
            return (out, box[0]) if box is not None else out

        fn = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs,
            out_specs=(act, rep) if box is not None else act,
            check_vma=False,
        )
        res = fn(*args)
        if box is not None:
            out, new_state = res
            box[0] = new_state
            return out
        return res

    return apply_fn, partial(_local_view, tp=tp)


def stack_tp_block_params(params: Dict, cfg, mesh: Mesh) -> Dict:
    """models.flux.stack_block_params for GLOBALLY SHARDED TP params: every
    ``double_blocks.{i}.K`` / ``single_blocks.{i}.K`` family stacks along a
    replicated leading depth axis with the per-block Megatron sharding
    preserved on the trailing dims (explicit out_shardings — each device
    stacks its own shards; no resharding traffic). Quantized leaves come
    out tp=True (GSPMD-safe dequant+dot until the shard_map local view
    rewraps them tp=False for the fused kernels).

    CONSUMES ``params`` like models.flux.stack_block_params: every family
    is validated up front (so a failure leaves the caller's dict intact),
    then the dict is cleared and families stack one at a time, awaiting
    each stack before releasing its source shards — peak extra device
    memory is one family's stack per device, not a second full generation.

    Raises ValueError BEFORE consuming for families that cannot stack
    (LoRA patches, ragged or non-uniform groups) — callers keep those
    models unrolled."""
    from jax.sharding import NamedSharding

    out, fams = flux_mod.group_block_params(params, cfg)
    for head in fams:
        for leaves in fams[head].values():
            ggml.check_stackable(leaves, allow_tp=True)
    params.clear()

    def stack_arrays(arrs, spec):
        sh = NamedSharding(mesh, _lead(spec))
        return jax.jit(
            lambda *xs: jnp.stack(xs), out_shardings=sh
        )(*arrs)

    def stack_family(rep_key: str, leaves):
        first = leaves[0]
        spec = shard_rules.flux_param_spec(rep_key)
        if isinstance(first, ggml.QTensor8T):
            qs = _qt_spec(spec)
            return ggml.StackedQTensor8T(
                qt3=stack_arrays([l.qt for l in leaves], qs),
                scales3=stack_arrays([l.scales_t for l in leaves], qs),
                shape=first.shape,
                tp=True,
            )
        if isinstance(first, ggml.QTensor8W):
            return ggml.StackedQTensor8W(
                qt3=stack_arrays([l.qt for l in leaves], _qt_spec(spec)),
                col_scales3=stack_arrays(
                    [l.col_scales for l in leaves], _cs_spec(spec)
                ),
                shape=first.shape,
                tp=True,
            )
        return stack_arrays(leaves, spec)

    for head, groups in fams.items():
        key = (flux_mod.DOUBLE_STACK_KEY if head == "double_blocks"
               else flux_mod.SINGLE_STACK_KEY)
        stacked = {}
        for rel in list(groups):
            leaves = groups.pop(rel)
            s = stack_family(_stack_rep_key(key, rel), leaves)
            del leaves
            # await before releasing the sources (see stack_block_params)
            jax.block_until_ready(s)
            stacked[rel] = s
        out[key] = stacked
    return out


def to_spmd_model(model, mesh: Mesh, axis: str = "model",
                  scan_blocks: bool = False):
    """Rewrap a TP-loaded DiffusionModel (GSPMD semantics) as a shard_map
    TP model: same sharded param arrays, fused-kernel compute path.

    ``scan_blocks`` stacks the DiT block params first
    (stack_tp_block_params) so the shard_map body runs the scan-over-blocks
    forward — the same ~7x compile-size cut as single-device --flux-scan,
    per shard. On success the INPUT model's param dict is consumed
    (stack_tp_block_params donation semantics) — treat ``model`` as dead
    and use the returned one. Falls back to the unrolled spmd forward
    (with a log, input intact) when the params cannot stack (e.g.
    LoRA-patched blocks)."""
    apply_fn, local_view = make_spmd_apply_fn(model.config, mesh, axis)
    params = model.params
    if scan_blocks:
        try:
            params = stack_tp_block_params(params, model.config, mesh)
        except ValueError as e:
            import logging

            logging.getLogger(__name__).warning(
                "flux_scan unavailable under spmd (%s); keeping the "
                "unrolled shard_map forward", e,
            )
    # uid=None mints a fresh trace identity: the runner caches key compiled
    # programs by uid, and the spmd apply_fn is a different program than
    # the GSPMD one this model was loaded with
    return dataclasses.replace(
        model, apply_fn=apply_fn, params=local_view(params), uid=None
    )
