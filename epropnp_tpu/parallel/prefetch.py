"""Asynchronous host-side data pipeline with device prefetch.

The reference overlaps data loading with compute via ``DataLoader``
worker *processes* + pinned-memory async H2D copies
(EPro-PnP-6DoF/tools/main.py:82-88 ``num_workers``, lib/train.py:62-68
``.cuda(non_blocking=True)``; the Det suite inherits mmdet's equivalent).
The TPU-native analogue implemented here:

* **Worker threads**, not processes: the per-batch work is numpy/cv2
  (crop, DZI, background substitution, collate) which releases the GIL,
  so threads overlap fully with the Python training loop at far lower
  cost than process workers — no pickling, no shared-memory tensors.
* **Bounded lookahead**: at most ``num_workers + prefetch_depth``
  batches are in flight, so a fast producer cannot run away from a slow
  consumer (DataLoader's ``prefetch_factor`` semantics).
* **Device prefetch**: each host batch is ``device_put`` (optionally
  sharded over a mesh axis — the multi-host/data-parallel path) as soon
  as it is ready, ``prefetch_depth`` batches ahead of the consumer, so
  the H2D transfer rides the tunnel/PCIe while the previous step
  computes. This is the idiom of ``flax.jax_utils.prefetch_to_device``,
  generalized to ``jax.sharding`` placement.

Composes with :class:`~epropnp_tpu.parallel.sampler.HostShardSampler`:
the sampler decides *which* indices this host loads, this module decides
*when* and *where* the resulting batches materialize.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


class PrefetchLoader:
    """Threaded batch producer + device-prefetch iterator.

    Args:
        make_fn: callable mapping one *work item* (e.g. an index array
            from ``HostShardSampler.epoch_batches``) to a host batch
            pytree of numpy arrays. Runs on worker threads; must be
            thread-safe (pure numpy/cv2 pipelines are).
        num_workers: producer threads (0 = produce inline on the
            consumer thread; still device-prefetches).
        prefetch_depth: device batches kept in flight ahead of the
            consumer. 2 double-buffers H2D against compute.
        sharding: optional ``jax.sharding.Sharding`` applied to every
            leaf on ``device_put`` (e.g. ``NamedSharding(mesh,
            P('data'))`` for data-parallel training). None = default
            device placement.
    """

    def __init__(self, make_fn: Callable[[Any], Any],
                 num_workers: int = 2, prefetch_depth: int = 2,
                 sharding: Optional[Any] = None):
        assert prefetch_depth >= 1
        self.make_fn = make_fn
        self.num_workers = num_workers
        self.prefetch_depth = prefetch_depth
        self.sharding = sharding

    def _put(self, host_batch: Any) -> Any:
        if self.sharding is None:
            return jax.tree_util.tree_map(jax.device_put, host_batch)
        # leaves of lower rank than the spec (per-batch scalars/metadata)
        # replicate instead — the same placement shard_map's P() gives them
        min_rank = len(getattr(self.sharding, 'spec', ()) or ())
        replicated = getattr(self.sharding, 'mesh', None)
        if replicated is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            replicated = NamedSharding(replicated, PartitionSpec())

        def put(a):
            nd = getattr(a, 'ndim', 0)
            if nd < min_rank and replicated is not None:
                return jax.device_put(a, replicated)
            return jax.device_put(a, self.sharding)

        return jax.tree_util.tree_map(put, host_batch)

    def __call__(self, work_items: Iterable[Any]) -> Iterator[Any]:
        """Yield device batches for ``work_items``, produced ahead.

        Ordering is preserved. Worker exceptions re-raise on the
        consumer thread at the failed batch's position.
        """
        if self.num_workers == 0:
            yield from self._inline(work_items)
            return

        items = iter(work_items)
        lookahead = self.num_workers + self.prefetch_depth
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = collections.deque()  # futures, in order
            on_device = collections.deque()  # device batches, in order
            exhausted = False
            while True:
                # top up the worker queue
                while not exhausted and len(pending) < lookahead:
                    try:
                        pending.append(pool.submit(self.make_fn,
                                                   next(items)))
                    except StopIteration:
                        exhausted = True
                # move ready host batches to device, up to depth
                while (pending and len(on_device) < self.prefetch_depth
                       and (pending[0].done()
                            or len(on_device) == 0)):
                    on_device.append(self._put(pending.popleft().result()))
                if not on_device:
                    break
                yield on_device.popleft()

    def _inline(self, work_items: Iterable[Any]) -> Iterator[Any]:
        on_device = collections.deque()
        for item in work_items:
            on_device.append(self._put(self.make_fn(item)))
            if len(on_device) > self.prefetch_depth:
                yield on_device.popleft()
        yield from on_device


def prefetch_to_device(batches: Iterable[Any], depth: int = 2,
                       sharding: Optional[Any] = None) -> Iterator[Any]:
    """Device-prefetch an existing host-batch iterator.

    Minimal form for loops that already have a (possibly synchronous)
    batch source: keeps ``depth`` batches resident on device ahead of
    the consumer so H2D overlaps compute. The producer still runs on
    the consumer thread — use :class:`PrefetchLoader` to offload it.
    """
    loader = PrefetchLoader(lambda b: b, num_workers=0,
                            prefetch_depth=depth, sharding=sharding)
    return loader(batches)


class BackgroundIterator:
    """Run any iterator on a daemon thread with a bounded queue.

    For batch sources that are a single generator (e.g.
    ``dataset.batches(...)``) rather than an indexable ``make_fn``:
    the generator advances on its own thread, up to ``maxsize`` items
    ahead. Exceptions re-raise on the consumer.
    """

    _END = object()

    def __init__(self, it: Iterable[Any], maxsize: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, args=(iter(it),), daemon=True)
        self._thread.start()

    def _run(self, it):
        try:
            for x in it:
                self._q.put(x)
        except BaseException as e:  # noqa: BLE001 — re-raised on consumer
            self._err = e
        finally:
            self._q.put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        x = self._q.get()
        if x is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return x
