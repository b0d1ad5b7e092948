"""Multi-process (multi-host) runtime smoke test: 2 real processes
rendezvous via jax.distributed, build a global mesh, and assemble
host-local batch shards into a global array (parallel/multihost.py —
the reference's mp.spawn + dist.init_process_group analog,
main.py:100-132)."""

import os
import socket
import subprocess
import sys


_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid = int(sys.argv[1])
port = sys.argv[2]

import numpy as np
from scale_imagenet_tpu.parallel.multihost import (
    global_batch, initialize, is_coordinator)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert is_coordinator() == (pid == 0)

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 1), ("data", "model"))
# each process contributes a distinguishable half of the global batch
images = np.full((2, 4, 4, 3), float(pid), np.float32)
labels = np.full((2,), pid, np.int32)
gi, gl = global_batch(mesh, images, labels)
assert gi.shape == (4, 4, 4, 3), gi.shape

total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(gi)
# halves are 0s and 1s -> global sum = 2*4*4*3
assert float(total) == 2 * 4 * 4 * 3, float(total)
lsum = jax.jit(lambda a: a.sum(),
               out_shardings=NamedSharding(mesh, P()))(gl)
assert int(lsum) == 2
print(f"proc{pid} OK", flush=True)
"""


def test_two_process_distributed_cpu(tmp_path):
    # (subprocess.communicate(timeout=150) is the hang guard)
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_SHARD_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid = int(sys.argv[1])
port = sys.argv[2]
shard_dir = sys.argv[3]

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scale_imagenet_tpu.data.shards import shard_loader
from scale_imagenet_tpu.parallel.multihost import global_batch, initialize

initialize(f"localhost:{port}", num_processes=2, process_id=pid)
mesh = Mesh(np.asarray(jax.devices()).reshape(4, 1), ("data", "model"))

# each host reads ONLY its round-robin shard subset and contributes it as
# its half of every global batch
ld = shard_loader(shard_dir, batch_size=4, drop_last=True,
                  rank=pid, world=2)
assert len(ld) == 1, len(ld)
seen = []
for images, labels in ld:
    gi, gl = global_batch(mesh, images, labels)
    assert gi.shape == (8, 8, 8, 3), gi.shape
    tot = jax.jit(lambda a: a.astype(np.float32).sum(),
                  out_shardings=NamedSharding(mesh, P()))(gl)
    seen.append(int(tot))
# global label sums are identical on every host (same global batches)
print(f"proc{pid} sums={seen}", flush=True)
"""


def test_multihost_shard_feeding(tmp_path):
    """2 real jax.distributed processes, each serving its rank's shard
    subset; global batches assemble to the same totals on both hosts."""
    import numpy as np

    from scale_imagenet_tpu.data.shards import write_shards

    class Synth:
        classes = ["a", "b"]

        def __len__(self):
            return 12

        def __getitem__(self, i):
            img = np.full((8, 8, 3), i, np.uint8)
            return img, i  # label == index, so sums identify content

    sd = tmp_path / "shards"
    write_shards(Synth(), str(sd), shard_size=3, num_workers=2)

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_SHARD_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port),
                          str(sd)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
    # rank0 serves shards 0,2 -> first 4 labels [0,1,2,6];
    # rank1 serves shards 1,3 -> [3,4,5,9]; global sum = 30 on both hosts
    assert "sums=[30]" in outs[0], outs[0]
    assert "sums=[30]" in outs[1], outs[1]
