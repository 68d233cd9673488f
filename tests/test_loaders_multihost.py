"""Multi-host input sharding: per-host strided slices must compose into
exactly one copy of the dataset per epoch (no drops, no duplicates), and
`shard_batch` must reject mis-sized batches instead of silently replicating.

Reference behavior being replaced: DDP `DistributedSampler` striding
(`/root/reference/model/dataloaders.py` via accelerate). Here each host takes
`order[host_id::num_hosts]` of a seed-deterministic permutation
(`data/loaders.py:81-92`), which is only correct if every host draws the
SAME permutation per epoch — asserted below.
"""
import numpy as np
import pytest

from animals3d_tpu.data.loaders import Loader, collate


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray(i, np.int64),
                "x": np.full((3,), float(i), np.float32)}


def _host_indices(loader, num_batches):
    out = []
    it = iter(loader)
    for _ in range(num_batches):
        out.extend(np.asarray(next(it)["idx"]).tolist())
    return out


@pytest.mark.parametrize("shuffle", [False, True])
def test_hosts_partition_each_epoch(shuffle):
    n, num_hosts, bs = 64, 4, 4
    per_host_batches = n // num_hosts // bs     # one full epoch per host
    all_idx = []
    for host in range(num_hosts):
        ld = Loader(_ToyDataset(n), batch_size=bs, shuffle=shuffle,
                    num_workers=2, seed=7, host_id=host,
                    num_hosts=num_hosts, infinite=True)
        all_idx.append(_host_indices(ld, per_host_batches))
    flat = sum(all_idx, [])
    assert len(flat) == n
    assert sorted(flat) == list(range(n)), "epoch must cover every sample once"
    # hosts are disjoint
    for a in range(num_hosts):
        for b in range(a + 1, num_hosts):
            assert not set(all_idx[a]) & set(all_idx[b])


def test_epochs_reshuffle_consistently():
    """Epoch 2's permutation differs from epoch 1's but still partitions."""
    n, num_hosts, bs = 32, 2, 4
    per_epoch = n // num_hosts // bs
    epochs = 2
    seen = [[] for _ in range(epochs)]
    for host in range(num_hosts):
        ld = Loader(_ToyDataset(n), batch_size=bs, shuffle=True,
                    num_workers=1, seed=3, host_id=host,
                    num_hosts=num_hosts, infinite=True)
        idx = _host_indices(ld, per_epoch * epochs)
        for e in range(epochs):
            seen[e].extend(idx[e * n // num_hosts:(e + 1) * n // num_hosts])
    for e in range(epochs):
        assert sorted(seen[e]) == list(range(n))
    assert seen[0] != seen[1], "shuffle must differ across epochs"


def test_shard_batch_rejects_missized_batch():
    import jax
    from jax.sharding import Mesh

    from animals3d_tpu.parallel.mesh import shard_batch

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >=2 devices")
    mesh = Mesh(np.asarray(devices[:2]), ("dp",))
    good = {"x": np.zeros((4, 3), np.float32), "none": None}
    out = shard_batch(good, mesh)
    assert out["none"] is None and out["x"].shape == (4, 3)
    bad = {"x": np.zeros((5, 3), np.float32)}
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(bad, mesh)


def test_host_sharded_loader_composes_with_shard_batch():
    """Per-host loader batch → shard_batch: every global sample lands on
    exactly one device shard."""
    import jax
    from jax.sharding import Mesh

    from animals3d_tpu.parallel.mesh import shard_batch

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >=4 devices")
    # 2 hosts × (2 local devices each) simulated on one process: host h uses
    # devices [2h, 2h+1]
    n, num_hosts, bs = 16, 2, 4
    global_ids = []
    for host in range(num_hosts):
        ld = Loader(_ToyDataset(n), batch_size=bs, shuffle=True,
                    num_workers=1, seed=11, host_id=host,
                    num_hosts=num_hosts, infinite=True)
        batch = next(iter(ld))
        mesh = Mesh(np.asarray(devices[2 * host:2 * host + 2]), ("dp",))
        sharded = shard_batch(batch, mesh)
        for shard in sharded["idx"].addressable_shards:
            ids = np.asarray(shard.data).tolist()
            assert len(ids) == bs // 2
            global_ids.extend(ids)
    assert len(set(global_ids)) == len(global_ids), \
        "no sample may appear on two device shards"
