"""Worker process for tests/test_multihost.py — real 2-process JAX.

Each worker pins the CPU backend with N virtual devices, joins the
distributed runtime through the SAME code paths a multi-host TPU launch
uses (`dist_util.init_dist('jax', ...)` → `jax.distributed.initialize`),
then drives rank-partitioned loading (EnlargedSampler) into
`make_global_batch`'s `make_array_from_process_local_data` branch
(parallel/mesh.py) and a jitted global reduction.

Reference parity: /root/reference/basicsr/utils/dist_util.py:10-57
(init_dist), basicsr/data/data_sampler.py:6-48 (EnlargedSampler rank
sharding), basicsr/train.py:64-79 (dist + sampler + loader wiring).

Usage (spawned by the test, never run under pytest itself):
    python multihost_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax
    jax.config.update('jax_platforms', 'cpu')

    # the reference's init_dist('pytorch') <-> ours with explicit
    # coordinator kwargs (options.py --launcher jax uses env-var form)
    from femasr_tpu.parallel.dist_util import (get_dist_info, init_dist,
                                               master_only)
    init_dist('jax', coordinator_address=f'127.0.0.1:{port}',
              num_processes=nproc, process_id=pid)
    rank, world = get_dist_info()
    assert (rank, world) == (pid, nproc), (rank, world)

    calls = []

    @master_only
    def only_master():
        calls.append(1)

    only_master()
    assert len(calls) == (1 if pid == 0 else 0)

    # rank-partitioned host loading -> global device batch.
    from femasr_tpu.data import EnlargedSampler
    from femasr_tpu.parallel.mesh import create_mesh, make_global_batch

    mesh = create_mesh()            # all GLOBAL devices: (data=2*N, model=1)
    n_local = jax.local_device_count()
    dataset_len = 2 * nproc * n_local
    sampler = EnlargedSampler(dataset_len, num_replicas=world, rank=rank,
                              ratio=1)
    sampler.set_epoch(0)
    my_indices = list(sampler)[:n_local]
    # every rank can reconstruct every other rank's deterministic shard —
    # that is what makes the global-mean check below exact.
    all_indices = []
    for r in range(world):
        s = EnlargedSampler(dataset_len, num_replicas=world, rank=r, ratio=1)
        s.set_epoch(0)
        all_indices.extend(list(s)[:n_local])
    assert len(set(all_indices)) == len(all_indices), 'rank shards overlap'

    local = {'gt': np.asarray(my_indices, np.float32).reshape(-1, 1, 1, 1)
             * np.ones((1, 4, 4, 3), np.float32)}
    batch = make_global_batch(mesh, local)   # multi-process branch
    g = batch['gt']
    assert g.shape == (world * n_local, 4, 4, 3), g.shape

    @jax.jit
    def global_mean(x):
        return x.mean()

    got = float(global_mean(g))
    expect = float(np.mean(all_indices))
    assert abs(got - expect) < 1e-5, (got, expect)

    # options.py --launcher jax branch: initialize() inside an already-
    # initialized runtime falls through to the single-process-fallback
    # except and still reports dist=True from process_count().
    import tempfile

    from femasr_tpu.utils.options import parse_options
    yml = os.path.join(tempfile.mkdtemp(), 'opt.yml')
    with open(yml, 'w') as f:
        f.write('name: mh_test\nmodel_type: FeMaSRModel\nscale: 4\n'
                'num_gpu: auto\nmanual_seed: 0\n')
    opt, _ = parse_options(tempfile.mkdtemp(), is_train=False,
                           argv=['-opt', yml, '--launcher', 'jax'])
    assert opt['dist'] is True
    assert opt['rank'] == pid and opt['world_size'] == nproc
    assert opt['num_gpu'] == jax.device_count()

    print(f'MULTIHOST_OK rank={rank}/{world} batch={g.shape} '
          f'mean={got}', flush=True)


if __name__ == '__main__':
    main()
