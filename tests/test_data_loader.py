"""PrefetchLoader: ordering, sharded placement, overlap, error and
lifecycle semantics (parallel/data.py — the trainer's input pipeline)."""

import threading
import time

import jax
import numpy as np
import pytest

from lightdiffusion_next_tpu.parallel import data as data_mod
from lightdiffusion_next_tpu.parallel.mesh import make_mesh


def _batches(n, start=0):
    for i in range(start, start + n):
        yield {"x": np.full((4, 2), i, np.float32), "i": np.int32(i)}


def test_order_and_values_preserved():
    loader = data_mod.PrefetchLoader(_batches(5))
    seen = [int(b["i"]) for b in loader]
    assert seen == [0, 1, 2, 3, 4]


def test_batches_are_device_resident():
    loader = data_mod.PrefetchLoader(_batches(1))
    b = next(iter(loader))
    assert isinstance(b["x"], jax.Array)
    assert b["x"].devices()  # committed somewhere


def test_sharded_over_data_axis():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4, 1)
    loader = data_mod.prefetch_to_mesh(_batches(2), mesh)
    b = next(iter(loader))
    # batch dim 4 split over 4 data shards -> each addressable shard holds 1 row
    shard_shapes = {s.data.shape for s in b["x"].addressable_shards}
    assert shard_shapes == {(1, 2)}
    np.testing.assert_array_equal(np.asarray(b["x"]), np.zeros((4, 2)))
    loader.close()


def test_prefetches_ahead_of_consumer():
    """With depth=2 the producer should run ahead: after the consumer takes
    batch 0, the loader must already have transferred more than 1 batch
    without any further consumer pulls."""
    produced = []

    def source():
        for i in range(4):
            produced.append(i)
            yield {"x": np.full((2,), i, np.float32)}

    loader = data_mod.PrefetchLoader(source(), depth=2)
    it = iter(loader)
    next(it)
    deadline = time.time() + 5.0
    while loader.transferred < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert loader.transferred >= 3  # 1 consumed + 2 queued ahead
    loader.close()


def test_source_error_propagates_at_failing_batch():
    def source():
        yield {"x": np.zeros((2,), np.float32)}
        raise RuntimeError("decode failed")

    loader = data_mod.PrefetchLoader(source())
    it = iter(loader)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_close_stops_thread_midstream():
    def source():
        i = 0
        while True:  # infinite source
            yield {"x": np.full((2,), i, np.float32)}
            i += 1

    loader = data_mod.PrefetchLoader(source(), depth=1)
    it = iter(loader)
    next(it)
    loader.close()
    alive = [t for t in threading.enumerate() if t.name == "ldt-prefetch"]
    assert not alive


def test_single_pass_guard():
    loader = data_mod.PrefetchLoader(_batches(1))
    list(loader)
    with pytest.raises(RuntimeError, match="single-pass"):
        iter(loader)


def test_drives_the_sharded_train_step():
    """End to end on the virtual mesh: jitted dp x tp train step consuming
    PrefetchLoader batches (the dryrun's make_batch path, threaded)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lightdiffusion_next_tpu.models import flux as flux_mod
    from lightdiffusion_next_tpu.parallel import trainer as trainer_mod

    cfg = flux_mod.FluxConfig(
        in_channels=4,
        hidden_size=128,
        num_heads=4,
        depth=1,
        depth_single_blocks=1,
        axes_dim=(8, 12, 12),
        context_in_dim=32,
        vec_in_dim=16,
    )
    mesh, params, opt_state, jit_step, _ = trainer_mod.build_sharded_trainer(
        2, 4, cfg
    )
    rng = np.random.default_rng(0)

    def source():
        for _ in range(2):
            yield {
                "latent": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                "noise": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                "t": rng.uniform(0, 1, (2,)).astype(np.float32),
                "context": rng.standard_normal((2, 4, 32)).astype(np.float32),
                "y": rng.standard_normal((2, 16)).astype(np.float32),
                "guidance": np.full((2,), 3.5, np.float32),
            }

    losses = []
    with mesh:
        for batch in data_mod.prefetch_to_mesh(source(), mesh):
            params, opt_state, loss = jit_step(params, opt_state, batch)
            losses.append(float(loss))
    assert len(losses) == 2 and all(np.isfinite(losses))
