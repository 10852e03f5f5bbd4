"""Prefetching device input pipeline for the trainer.

The reference has no training and therefore no data loader (SURVEY §2:
"Parallelism & distributed communication: NONE"). On TPU the input
pipeline is a first-class runtime component: a jitted train step leaves
the host idle while the device computes, so the NEXT batch's
host->device transfer should ride under the CURRENT step's compute
instead of serializing after it. This is the standard double-buffered
prefetch: a background thread pulls host batches from the source,
`jax.device_put`s them onto the batch sharding (sharded over the "data"
mesh axis), and parks up to ``depth`` device-resident batches in a
bounded queue.

Works with any iterable of pytrees of numpy arrays — file readers,
generators, tf.data-style iterators — the loader only owns placement
and overlap, not decoding.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


class _Stop:
    pass


class PrefetchLoader:
    """Iterate device-resident batches, transferring ``depth`` ahead.

    ``source``: an iterable (or a zero-arg callable returning an
    iterator) of pytrees of host arrays. ``sharding``: a
    jax.sharding.Sharding (or pytree-of-shardings matching the batch
    structure, or None for default placement) applied via device_put in
    the background thread. Exceptions in the source propagate to the
    consumer at the batch where they occurred; ``close()`` (also called
    on iterator exhaustion and GC) stops the thread promptly.
    """

    def __init__(
        self,
        source: Iterable[Any] | Callable[[], Iterator[Any]],
        sharding: Any = None,
        depth: int = 2,
    ):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._source = source
        self._sharding = sharding
        self._depth = depth
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        self._started = False
        self._stop = threading.Event()
        self.transferred = 0  # batches device_put so far (monotonic)

    # -- background producer ------------------------------------------------

    def _put(self, batch):
        # device_put accepts a single Sharding (broadcast over leaves) or a
        # matching pytree of shardings
        if self._sharding is None:
            return jax.device_put(batch)
        sh = self._sharding
        if isinstance(sh, jax.sharding.NamedSharding) and len(sh.spec):
            # broadcast a batch-axis sharding over the pytree, but leaves of
            # lower rank than the spec (per-batch scalars, step counters)
            # replicate instead of erroring
            import numpy as np

            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(sh.mesh, PartitionSpec())
            shardings = jax.tree_util.tree_map(
                lambda v: sh if np.ndim(v) >= len(sh.spec) else repl, batch
            )
            return jax.device_put(batch, shardings)
        return jax.device_put(batch, sh)

    def _run(self, it):
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                dev = self._put(batch)
                self.transferred += 1
                while not self._stop.is_set():
                    try:
                        self._q.put(dev, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                else:
                    return
            self._enqueue_final(_Stop())
        except BaseException as e:  # propagate to the consumer
            self._enqueue_final(e)

    def _enqueue_final(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    # -- consumer -----------------------------------------------------------

    def __iter__(self):
        if self._started:
            raise RuntimeError("PrefetchLoader is single-pass; make a new one")
        self._started = True
        it = iter(self._source() if callable(self._source) else self._source)
        self._q = queue.Queue(maxsize=self._depth)
        self._thread = threading.Thread(
            target=self._run, args=(it,), daemon=True, name="ldt-prefetch"
        )
        self._thread.start()
        return self

    def __next__(self):
        if self._q is None:
            iter(self)
        item = self._q.get()
        if isinstance(item, _Stop):
            self.close()
            raise StopIteration
        if isinstance(item, BaseException):
            self.close()
            raise item
        return item

    def close(self):
        self._stop.set()
        t, self._thread = self._thread, None
        if t is not None and t is not threading.current_thread():
            t.join(timeout=5.0)

    def __del__(self):  # pragma: no cover - GC timing
        self._stop.set()


def prefetch_to_mesh(source, mesh, depth: int = 2) -> PrefetchLoader:
    """Prefetch host batches sharded over the mesh's "data" axis (the
    trainer's batch layout, parallel.sharding.batch_sharding)."""
    from lightdiffusion_next_tpu.parallel import sharding as shard_rules

    return PrefetchLoader(source, shard_rules.batch_sharding(mesh), depth=depth)
