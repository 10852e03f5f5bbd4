"""Compilation "nodes" — API parity with the reference's Stable-Fast and
torch.compile wrappers.

The reference ships two compile plugins:
- Stable-Fast (src/StableFast/StableFast.py:77-274): lazy TorchScript trace
  keyed by arg-shape hash + CUDA-graph capture, installed as a unet function
  wrapper. Claimed +70% (README.md:37).
- WaveSpeed EnhancedCompileModel (src/WaveSpeed/misc_nodes.py:7-189):
  torch.compile wrapper (unused by the pipeline).

On this framework every model call is ALREADY a jit-compiled XLA program
with a persistent compilation cache (utils.state_dict.enable_compilation
_cache) — the reference's 1.9 -> 2.8 it/s compile win is the baseline, not a
feature (SURVEY §7). These shims keep the node API so reference workflows
port cleanly; they configure caching rather than wrapping modules.
"""

from __future__ import annotations

from lightdiffusion_next_tpu.utils import state_dict as sd_utils


class ApplyStableFastUnet:
    """StableFast.ApplyStableFastUnet parity: a no-op that ensures the
    persistent compilation cache is enabled and returns the model."""

    def apply_stable_fast(self, model, enable_cuda_graph: bool = False):
        sd_utils.enable_compilation_cache()
        return (model,)


class EnhancedCompileModel:
    """WaveSpeed misc_nodes.EnhancedCompileModel parity (same rationale)."""

    def patch(self, model, *args, **kwargs):
        sd_utils.enable_compilation_cache()
        return (model,)
