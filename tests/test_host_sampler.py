"""HostShardSampler: torch-DistributedSampler-parity semantics."""

import numpy as np

from epropnp_tpu.parallel.sampler import HostShardSampler


def _gather(n, hosts, **kw):
    samplers = [HostShardSampler(num_samples=n, num_hosts=hosts, host_id=h,
                                 **kw) for h in range(hosts)]
    return samplers, [s.epoch_indices(0) for s in samplers]


def test_partition_exact_when_divisible():
    samplers, shards = _gather(64, 4, seed=3)
    assert all(len(s) == 16 for s in shards)
    union = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(union, np.arange(64))  # disjoint cover


def test_padding_wraps_and_equal_lengths():
    samplers, shards = _gather(10, 4)  # ceil -> 3 per host, 2 repeats
    assert all(len(s) == 3 for s in shards)
    all_inds = np.concatenate(shards)
    assert set(all_inds) == set(range(10))  # every sample still appears


def test_drop_last_truncates():
    _, shards = _gather(10, 4, drop_last=True)
    assert all(len(s) == 2 for s in shards)
    assert len(set(np.concatenate(shards))) == 8


def test_deterministic_and_epoch_varying():
    s = HostShardSampler(num_samples=100, num_hosts=2, host_id=1, seed=7)
    s2 = HostShardSampler(num_samples=100, num_hosts=2, host_id=1, seed=7)
    np.testing.assert_array_equal(s.epoch_indices(5), s2.epoch_indices(5))
    assert not np.array_equal(s.epoch_indices(0), s.epoch_indices(1))


def test_same_permutation_across_hosts():
    # interleave the two hosts' strided shards -> the common permutation
    _, shards = _gather(8, 2, seed=1)
    merged = np.empty(8, np.int64)
    merged[0::2], merged[1::2] = shards[0], shards[1]
    expect = np.arange(8)[np.random.default_rng(1).permutation(8)]
    np.testing.assert_array_equal(merged, expect)


def test_cbgs_indices_passthrough():
    cbgs_inds = [0, 0, 1, 2, 2, 2, 3]  # duplicated, CBGS-style
    _, shards = _gather(None, 2, indices=cbgs_inds, shuffle=False)
    merged = sorted(np.concatenate(shards).tolist())
    assert merged == sorted(cbgs_inds + [cbgs_inds[0]])  # +1 pad wrap


def test_epoch_batches():
    s = HostShardSampler(num_samples=32, num_hosts=2, host_id=0)
    batches = list(s.epoch_batches(0, 4))
    assert len(batches) == 4 and all(len(b) == 4 for b in batches)
    batches = list(s.epoch_batches(0, 5, drop_partial=False))
    assert [len(b) for b in batches] == [5, 5, 5, 1]
