"""Real multi-process (process_count > 1) exercise on CPU — VERDICT r4 #6.

Everything else in the suite is single-process multi-device; these tests
spawn TWO actual processes that join one JAX distributed runtime and run
the multi-host code paths end to end:

- `dist_util.init_dist('jax', coordinator_address=...)` (the launcher)
- `get_dist_info` / `master_only` rank gating
- `EnlargedSampler` cross-rank disjointness + coverage
- `make_global_batch`'s `jax.make_array_from_process_local_data` branch
  (parallel/mesh.py multi-process assembly)
- a jitted global reduction over the assembled array
- `parse_options --launcher jax` (options.py dist wiring)

Reference parity: basicsr/utils/dist_util.py:10-57, data_sampler.py:6-48.
The reference validated this surface with real 2-GPU DDP
(options/train_FeMaSR_LQ_stage.yml:28 num_gpu: 2); this is the TPU-native
equivalent at CI scale.
"""
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, 'multihost_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed():
    nproc = 2
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS='cpu',
        XLA_FLAGS='--xla_force_host_platform_device_count=2',
    )
    # workers must not inherit the suite's pinned single-process config
    env.pop('JAX_COORDINATOR_ADDRESS', None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert 'MULTIHOST_OK' in out, out
    assert 'rank=0/2' in outs[0] and 'rank=1/2' in outs[1]
