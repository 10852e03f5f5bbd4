"""Sharding rules: param PartitionSpecs per model family.

Flux tensor parallelism is the Megatron pattern: column-parallel qkv/mlp-in,
row-parallel proj/mlp-out, so each double/single block needs exactly one
all-reduce per stream per sublayer — XLA inserts the psum from the param
shardings via SPMD propagation. Embedders/modulation/norm scales replicate.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def flux_param_spec(key: str) -> "P":
    """PartitionSpec for one Flux param key (tensor parallel over "model")."""
    # column-parallel (output dim sharded): qkv, mlp.0, linear1 (fused or
    # layout-split into linear1_qkv/linear1_mlp — parallel.layout)
    if any(
        key.endswith(s)
        for s in (
            "attn.qkv.weight",
            "mlp.0.weight",
            "linear1.weight",
            "linear1_qkv.weight",
            "linear1_mlp.weight",
        )
    ):
        return P("model", None)
    if any(
        key.endswith(s)
        for s in (
            "attn.qkv.bias",
            "mlp.0.bias",
            "linear1.bias",
            "linear1_qkv.bias",
            "linear1_mlp.bias",
        )
    ):
        return P("model")
    # row-parallel (input dim sharded): proj, mlp.2, linear2 (fused or
    # layout-split into linear2_attn/linear2_mlp — parallel.layout)
    if any(
        key.endswith(s)
        for s in (
            "attn.proj.weight",
            "mlp.2.weight",
            "linear2.weight",
            "linear2_attn.weight",
            "linear2_mlp.weight",
        )
    ):
        return P(None, "model")
    return P()  # replicate (mods, embedders, norms, in/out projections)


def _quantized_sharding(leaf, spec: "P", mesh: Mesh):
    """Shardings for a ggml.QTensor8T leaf from its LOGICAL (out, in) spec.

    Device layout is transposed: qt int8 (in=K, out=N), scales_t (K/32, N).
    Column-parallel P("model", None) (out sharded) -> shard axis 1 of both;
    row-parallel P(None, "model") (in sharded) -> shard axis 0 of both
    (K and K/32 both divide evenly per 32-block granularity).

    The returned record carries tp=True whenever the mesh spans more than
    one device — shard_params() stamps that onto the weight so its forward
    takes the SPMD-partitionable dequant+dot path instead of the
    single-device Pallas kernel (ops/ggml.py QTensor8T.tp)."""
    from lightdiffusion_next_tpu.ops import ggml

    if spec == P("model", None):
        qs = P(None, "model")
    elif spec == P(None, "model"):
        qs = P("model", None)
    else:
        qs = P()
    if isinstance(leaf, ggml.QTensor8W):
        # w8a8 per-column layout: col_scales (1, N) follow the N axis when
        # out-sharded and replicate when in(K)-sharded
        cs = P(None, "model") if qs == P(None, "model") else P()
        return ggml.QTensor8W(
            qt=_ns(mesh, *qs),
            col_scales=_ns(mesh, *cs),
            shape=leaf.shape,
            tp=mesh.devices.size > 1,
        )
    return ggml.QTensor8T(
        qt=_ns(mesh, *qs),
        scales_t=_ns(mesh, *qs),
        shape=leaf.shape,
        tp=mesh.devices.size > 1,
    )


def flux_sharding_for(sd: Dict, mesh: Mesh):
    """``sharding_for(key)`` callback for ggml.to_device_quantized over a
    TP-laid-out Flux state dict: NamedShardings for dense leaves, a
    quantized-record for 2-D quantized ones (the public face of
    _quantized_sharding — loader, tests and the dryrun all build the same
    closure)."""
    from lightdiffusion_next_tpu.ops import ggml

    def sharding_for(key):
        leaf = sd[key]
        spec = flux_param_spec(key)
        if ggml.is_quantized(leaf) and len(leaf.shape) == 2:
            return _quantized_sharding(leaf, spec, mesh)
        return _ns(mesh, *spec)

    return sharding_for


def shard_state_dict(sd: Dict, mesh: Mesh, dtype=None) -> Dict:
    """TP-laid-out Flux state dict (host QTensor8/np or mixed leaves) ->
    sharded device params per flux_param_spec. ``dtype`` is the dense-leaf
    cast (default f32 — tests/dryrun; the loader passes its policy)."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.ops import ggml

    return ggml.to_device_quantized(
        sd, dtype=dtype or jnp.float32, sharding_for=flux_sharding_for(sd, mesh)
    )


def flux_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    from lightdiffusion_next_tpu.ops import ggml

    out = {}
    for k in params:
        spec = flux_param_spec(k)
        leaf = params[k]
        # NB: isinstance, not hasattr("base") — np.ndarray has a .base attr
        if isinstance(leaf, ggml.QTensorLoRA):  # quantized + compute-time LoRA
            # base shards per the Megatron spec; the skinny low-rank factors
            # replicate (GSPMD inserts any needed resharding around them)
            out[k] = ggml.QTensorLoRA(
                base=_quantized_sharding(leaf.base, spec, mesh),
                up=_ns(mesh),
                down=_ns(mesh),
            )
        elif hasattr(leaf, "qt"):  # fused-layout quantized weight
            out[k] = _quantized_sharding(leaf, spec, mesh)
        else:
            out[k] = _ns(mesh, *spec)
    return out


def replicated_shardings(params: Dict, mesh: Mesh) -> Dict:
    return {k: _ns(mesh) for k in params}


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Activations: batch over "data", replicated over "model"."""
    return _ns(mesh, "data")


def shard_params(params: Dict, shardings: Dict) -> Dict:
    """device_put params to their shardings; quantized leaves are rebuilt
    with the explicit tp flag from their sharding record (the flag is aux
    data, so the plain structural device_put would reject the mismatch)."""
    from lightdiffusion_next_tpu.ops import ggml

    def put(v, s):
        if isinstance(v, ggml.QTensorLoRA):
            return ggml.QTensorLoRA(
                base=put(v.base, s.base),
                up=jax.device_put(v.up, s.up),
                down=jax.device_put(v.down, s.down),
            )
        if isinstance(v, ggml.QTensor8W):
            return ggml.QTensor8W(
                qt=jax.device_put(v.qt, s.qt),
                col_scales=jax.device_put(v.col_scales, s.col_scales),
                shape=v.shape,
                tp=s.tp,
            )
        if hasattr(v, "qt"):
            return ggml.QTensor8T(
                qt=jax.device_put(v.qt, s.qt),
                scales_t=jax.device_put(v.scales_t, s.scales_t),
                shape=v.shape,
                tp=s.tp,
            )
        return jax.device_put(v, s)

    return {k: put(v, shardings[k]) for k, v in params.items()}


HEAD_SHARDED_NOTE = """
With qkv column-sharded, each "model" shard computes a contiguous block of
attention heads (Flux head_dim=128, 24 heads -> 3 heads/chip on v5e-8); the
per-head RMSNorm and RoPE are elementwise over the head dim so they propagate
the sharding unchanged; attn.proj's row sharding triggers the single
all-reduce that completes the Megatron block.
"""
