"""Per-host sharded sampling for multi-host (DCN) data-parallel training.

The reference feeds each DDP rank a disjoint slice of the dataset via
``torch.utils.data.DistributedSampler`` (mmdet builds it implicitly;
SURVEY.md §2.4: "the nuScenes loader is per-rank sharded by mmdet's
DistributedSampler"). On TPU pods the analogue is per-*host* sharding:
every JAX process loads only the samples whose device shards live on its
chips, then ``parallel.shard_batch`` places the host batch over the local
mesh slice and XLA handles the cross-host collectives.

Semantics mirror torch's ``DistributedSampler(shuffle=True)``:

* One deterministic permutation per epoch, identical on every host
  (seeded by ``(seed, epoch)`` only — never by host id).
* The permutation is padded by wrapping around (``drop_last=False``) or
  truncated (``drop_last=True``) to a common multiple, so every host
  yields exactly the same number of samples — a hard requirement for
  SPMD, where a straggler host would deadlock the collectives.
* Hosts take strided slices (``indices[host_id::num_hosts]``), matching
  the torch layout.

Composes with ``det.main.CBGSWrapper`` (class-balanced duplication):
pass its resampled index list as ``indices``.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import jax


class HostShardSampler:
    """Deterministic per-host epoch sampler (DistributedSampler parity).

    Args:
        num_samples: dataset length (ignored if ``indices`` is given).
        indices: optional explicit sample indices (e.g. from CBGS
            resampling); defaults to ``arange(num_samples)``.
        num_hosts/host_id: default to ``jax.process_count()`` /
            ``jax.process_index()``.
        shuffle: reshuffle each epoch (same order on all hosts).
        seed: base seed; epoch ``e`` uses ``seed + e``.
        drop_last: drop the tail so all hosts are equal-length (True) or
            pad by wrapping to the next multiple (False, torch default).
    """

    def __init__(self, num_samples: Optional[int] = None,
                 indices: Optional[Sequence[int]] = None,
                 num_hosts: Optional[int] = None,
                 host_id: Optional[int] = None,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False):
        if indices is None:
            assert num_samples is not None
            indices = np.arange(num_samples)
        self.indices = np.asarray(indices, np.int64)
        self.num_hosts = (jax.process_count() if num_hosts is None
                          else num_hosts)
        self.host_id = jax.process_index() if host_id is None else host_id
        assert 0 <= self.host_id < self.num_hosts
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        n = len(self.indices)
        if drop_last:
            self.num_per_host = n // self.num_hosts
        else:
            self.num_per_host = -(-n // self.num_hosts)  # ceil

    def __len__(self) -> int:
        return self.num_per_host

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """This host's sample indices for ``epoch`` (len == len(self))."""
        order = self.indices
        if self.shuffle:
            order = order[np.random.default_rng(
                self.seed + epoch).permutation(len(order))]
        total = self.num_per_host * self.num_hosts
        if total > len(order):  # pad by wrapping (torch semantics)
            order = np.concatenate([order, order[:total - len(order)]])
        else:
            order = order[:total]
        return order[self.host_id::self.num_hosts]

    def epoch_batches(self, epoch: int, batch_size_per_host: int,
                      drop_partial: bool = True) -> Iterator[np.ndarray]:
        """Yield per-host index batches of ``batch_size_per_host``."""
        inds = self.epoch_indices(epoch)
        n_full = len(inds) // batch_size_per_host
        for i in range(n_full):
            yield inds[i * batch_size_per_host:(i + 1) * batch_size_per_host]
        if not drop_partial and n_full * batch_size_per_host < len(inds):
            yield inds[n_full * batch_size_per_host:]
