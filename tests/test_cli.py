"""CLI surface tests: eval on a synthetic ImageFolder and truth-table
compilation end-to-end."""

import json
import os

import numpy as np
import pytest

from scale_imagenet_tpu.main import main


@pytest.fixture(scope="module")
def fake_imagenet(tmp_path_factory):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path_factory.mktemp("fake_imagenet")
    rng = np.random.default_rng(0)
    for c in range(3):
        d = root / "val" / f"n{c:08d}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, (280, 260, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(root)


def test_cli_eval(fake_imagenet, tmp_path):
    top1, top5 = main([
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--root_dir", str(tmp_path), "--log_interval", "1",
        "--mesh_data", "1",
    ])
    assert 0.0 <= top1 <= 100.0 and 0.0 <= top5 <= 100.0
    # batch not divisible by the mesh data axis -> clear error, not an
    # empty-looking run (the silent-producer-death regression)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        main(["--mode", "eval", "--data_dir", fake_imagenet,
              "--nfilter", "4", "--tfilter", "4", "--layers", "0",
              "--eval_batch_size", "3", "--mesh_data", "2",
              "--root_dir", str(tmp_path)])
    # metrics JSONL written
    logs = list((tmp_path / "logs").rglob("metrics.jsonl"))
    # (the failed-validation run above also created an empty log dir)
    assert logs and max(f.stat().st_size for f in logs) > 0


def test_cli_compile(tmp_path):
    out = str(tmp_path / "artifacts")
    summary = main([
        "--mode", "compile", "--model", "ttnet_imagenet_xsmall",
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--compile_out", out, "--root_dir", str(tmp_path),
    ])
    assert summary["total_gates"] > 0
    assert os.path.exists(os.path.join(out, "summary.json"))
    with open(os.path.join(out, "summary.json")) as f:
        assert json.load(f)["total_gates"] == summary["total_gates"]
    # per-block artifact dirs exist and are non-empty
    dirs = [d for d in os.listdir(out) if d.startswith("block")]
    assert dirs
    assert os.listdir(os.path.join(out, dirs[0]))


def test_cli_compile_fhe_and_vgg_stem(tmp_path):
    """--mode compile covers every LUT-servable family: the FHE models
    (whose n=4 tables are what TT_FHE_SMALL.py:322-431 extracts) and
    the VGG16-stem ImageNet variant."""
    for model, extra in [("TT_FHE_SMALL", ["--nfilter", "4",
                                           "--tfilter", "4"]),
                         ("TT_vf_19lv3_imgnet_xsmall_VGG", [])]:
        out = str(tmp_path / f"artifacts_{model}")
        summary = main(["--mode", "compile", "--model", model] + extra +
                       ["--compile_out", out, "--root_dir", str(tmp_path)])
        assert summary["total_gates"] > 0
        assert os.path.exists(os.path.join(out, "summary.json"))


@pytest.mark.parametrize("model", ["ttnet_imagenet_xsmall",
                                   "TT_vf_19lv3_imgnet_xsmall_VGG"])
def test_cli_lut_serving(fake_imagenet, tmp_path, model):
    """--lut: compiled truth-table serving through the CLI (flagship
    family and the VGG16-stem variant) — same accuracy/loss as conv
    mode, and the archive round-trips via --lut_path (compile+save on
    first run, load on second)."""
    args = [
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--model", model,
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--root_dir", str(tmp_path), "--mesh_data", "1",
    ]
    conv = main(args)
    lut_path = str(tmp_path / "luts.npz")
    lut1 = main(args + ["--lut", "--lut_path", lut_path])
    assert os.path.exists(lut_path)
    lut2 = main(args + ["--lut", "--lut_path", lut_path])  # load branch
    assert lut1 == lut2
    assert lut1 == conv  # bit-faithful blocks -> identical argmax/top5


def test_cli_dp_compiled_serving(fake_imagenet, tmp_path):
    """--lut / --gates over a multi-device 'data' mesh WITHOUT --tp:
    the shard_map dp wrapper runs the single-device compiled twin per
    batch slice (tables/cubes replicated, zero collectives) — metrics
    identical to the single-device runs (which equal conv mode)."""
    args = [
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--model", "ttnet_imagenet_xsmall",
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--root_dir", str(tmp_path), "--log_interval", "1",
    ]
    ref = main(args + ["--lut", "--mesh_data", "1"])
    dp = main(args + ["--lut", "--mesh_data", "2"])
    assert dp == ref
    dp4 = main(args + ["--lut", "--mesh_data", "4"])
    assert dp4 == ref


def test_cli_tp_lut_serving(fake_imagenet, tmp_path):
    """--tp --lut: compiled-network serving over the ('data','model')
    mesh — truth tables sharded by channel group; metrics equal the
    single-device LUT run."""
    args = [
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--model", "ttnet_imagenet_xsmall",
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--root_dir", str(tmp_path), "--log_interval", "1",
    ]
    ref = main(args + ["--lut", "--mesh_data", "1"])
    tp = main(args + ["--lut", "--tp", "--mesh_data", "2",
                      "--mesh_model", "2"])
    assert tp[0] == pytest.approx(ref[0], abs=1e-3)
    assert tp[1] == pytest.approx(ref[1], abs=1e-3)


def test_cli_shard_training(fake_imagenet, tmp_path):
    """--mode train --shards_dir: shard-fed training with on-device
    normalize + flip; one epoch end-to-end through the CLI."""
    shards = str(tmp_path / "train_shards")
    main(["--mode", "eval", "--data_dir", fake_imagenet,
          "--write_shards", shards, "--shards_split", "val",
          "--num_workers", "2", "--root_dir", str(tmp_path)])
    main([
        "--mode", "train", "--shards_dir", shards,
        "--model", "ttnet_imagenet_xsmall",
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--train_batch_size", "4", "--max_epochs", "1",
        "--root_dir", str(tmp_path), "--mesh_data", "1",
        "--log_interval", "1", "--amp",
    ])
    ckpt_root = tmp_path / "ckpt"
    assert any(ckpt_root.rglob("*")), "no checkpoint written"


def test_cli_tp_eval(fake_imagenet, tmp_path):
    """--tp: channel-group tensor-parallel eval through the CLI on a
    4x2 virtual mesh, same result as the GSPMD data-parallel path."""
    args = [
        "--mode", "eval", "--data_dir", fake_imagenet,
        "--model", "ttnet_imagenet_small",
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",  # p=32
        "--eval_batch_size", "8", "--num_workers", "2",
        "--root_dir", str(tmp_path), "--mesh_data", "4", "--mesh_model", "2",
    ]
    dp = main(args)
    tp = main(args + ["--tp"])
    assert tp == dp


def test_cli_train_resume(fake_imagenet, tmp_path, capsys):
    """--ckpt pointing at a native checkpoint resumes the FULL train
    state (optimizer momentum + step counter), not just weights."""
    shards = str(tmp_path / "shards")
    main(["--mode", "eval", "--data_dir", fake_imagenet,
          "--write_shards", shards, "--num_workers", "2",
          "--root_dir", str(tmp_path)])
    args = [
        "--mode", "train", "--shards_dir", shards,
        "--model", "ttnet_imagenet_xsmall",
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--train_batch_size", "4", "--root_dir", str(tmp_path),
        "--mesh_data", "1", "--log_interval", "1",
    ]
    main(args + ["--max_epochs", "1"])
    last = sorted((tmp_path / "ckpt").rglob("step_*"))[-1]
    capsys.readouterr()
    main(args + ["--max_epochs", "2", "--ckpt", str(last)])
    out = capsys.readouterr().out
    assert "resumed full train state at step 3" in out, out


def test_cli_train_with_validation(fake_imagenet, tmp_path, capsys):
    """Per-epoch validation + best-checkpoint tracking during training
    (the reference's test() call each epoch)."""
    shards = str(tmp_path / "shards")
    main(["--mode", "eval", "--data_dir", fake_imagenet,
          "--write_shards", shards, "--num_workers", "2",
          "--root_dir", str(tmp_path)])
    capsys.readouterr()
    main([
        "--mode", "train", "--shards_dir", shards,
        "--eval_shards_dir", shards,
        "--model", "ttnet_imagenet_xsmall",
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--train_batch_size", "4", "--eval_batch_size", "4",
        "--max_epochs", "1", "--root_dir", str(tmp_path),
        "--mesh_data", "1", "--log_interval", "1",
    ])
    out = capsys.readouterr().out
    assert "val: top1" in out, out
    assert any(p.name == "best" for p in (tmp_path / "ckpt").rglob("*"))


def test_cli_shard_tp_eval(fake_imagenet, tmp_path):
    """--shards_dir composes with --tp (u8 normalize inside the TP step)."""
    shards = str(tmp_path / "shards")
    main(["--mode", "eval", "--data_dir", fake_imagenet,
          "--write_shards", shards, "--num_workers", "2",
          "--root_dir", str(tmp_path)])
    args = [
        "--mode", "eval", "--shards_dir", shards,
        "--model", "ttnet_imagenet_small",
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "8",
        "--root_dir", str(tmp_path), "--mesh_data", "4", "--mesh_model", "2",
    ]
    dp = main(args)
    tp = main(args + ["--tp"])
    assert tp == dp


def test_cli_flag_guards(fake_imagenet, tmp_path):
    base = ["--mode", "eval", "--data_dir", fake_imagenet,
            "--model", "ttnet_imagenet_xsmall", "--nfilter", "4",
            "--tfilter", "4", "--layers", "0", "--eval_batch_size", "4",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    with pytest.raises(ValueError, match="bf16"):
        main(base + ["--bf16", "--lut"])
    # --tp --lut is a SUPPORTED combination since r3 (mesh-sharded
    # compiled-network serving, test_cli_tp_lut_serving), and plain
    # --lut now also serves the FHE family (test_cli_fhe_lut_eval); the
    # remaining guards: families with no LUT path at all, and TP
    # compiled serving outside the ttnet_imagenet family
    with pytest.raises(ValueError, match="ttnet_imagenet and TT_FHE"):
        main(["--mode", "eval", "--data_dir", fake_imagenet,
              "--model", "resnet18", "--eval_batch_size", "4",
              "--root_dir", str(tmp_path), "--mesh_data", "1", "--lut"])
    with pytest.raises(ValueError, match="--tp --lut"):
        main(["--mode", "eval", "--data_dir", fake_imagenet,
              "--model", "TT_FHE_SMALL", "--nfilter", "4", "--tfilter",
              "4", "--eval_batch_size", "4", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--tp", "--lut"])


def test_cli_train_flag_honesty(fake_imagenet, tmp_path):
    """No accepted flag may silently do nothing (the reference harness
    property, main.py:29-79): serving/eval-only flags in --mode train and
    training-only flags in --mode eval raise with the right flag named."""
    train = ["--mode", "train", "--data_dir", fake_imagenet,
             "--model", "ttnet_imagenet_xsmall", "--nfilter", "4",
             "--tfilter", "4", "--layers", "0", "--train_batch_size", "4",
             "--max_epochs", "1", "--root_dir", str(tmp_path),
             "--mesh_data", "1"]
    with pytest.raises(ValueError, match="--lut is a serving mode"):
        main(train + ["--lut"])
    with pytest.raises(ValueError, match="training is --amp"):
        main(train + ["--bf16"])
    with pytest.raises(ValueError, match="--native_data"):
        main(train + ["--native_data"])
    with pytest.raises(ValueError, match="drop --amp"):
        main(train + ["--tp", "--amp"])
    with pytest.raises(ValueError, match="--stability_eps"):
        main(train + ["--tp", "--stability_eps", "0.1"])
    with pytest.raises(ValueError, match="ttnet_imagenet family"):
        main(["--mode", "train", "--data_dir", fake_imagenet,
              "--model", "resnet18", "--train_batch_size", "4",
              "--max_epochs", "1", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--tp"])

    ev = ["--mode", "eval", "--data_dir", fake_imagenet,
          "--model", "ttnet_imagenet_xsmall", "--nfilter", "4",
          "--tfilter", "4", "--layers", "0", "--eval_batch_size", "4",
          "--root_dir", str(tmp_path), "--mesh_data", "1"]
    with pytest.raises(ValueError, match="TRAINING"):
        main(ev + ["--amp"])
    with pytest.raises(ValueError, match="TRAINING"):
        main(ev + ["--stability_eps", "0.1"])


def test_cli_tp_training(fake_imagenet, tmp_path, capsys):
    """--tp --mode train through the CLI: channel-sharded params +
    shard-local optimizer on a 4x2 virtual mesh.  Shard-fed (on-device
    flip keyed by --seed, folded by the 'data' axis index in BOTH steps),
    so the first-step loss must match the dp run to float tolerance; the
    sharded state checkpoints and resumes."""
    import re

    shards = str(tmp_path / "shards")
    main(["--mode", "eval", "--data_dir", fake_imagenet,
          "--write_shards", shards, "--num_workers", "2",
          "--root_dir", str(tmp_path)])
    args = [
        "--mode", "train", "--shards_dir", shards,
        "--model", "ttnet_imagenet_small",
        "--nfilter", "8", "--tfilter", "4", "--layers", "0",  # p=32
        "--model_arg", "num_classes=16",  # the 1000-class fc only slows it
        "--train_batch_size", "8", "--max_epochs", "1",
        "--mesh_data", "4", "--mesh_model", "2",
        "--log_interval", "1",
    ]

    def first_loss(out):
        m = re.search(r"epoch 0 \[0/\d+\] loss ([\d.]+)", out)
        assert m, out
        return float(m.group(1))

    capsys.readouterr()
    main(args + ["--root_dir", str(tmp_path / "dp")])
    dp_loss = first_loss(capsys.readouterr().out)

    main(args + ["--tp", "--root_dir", str(tmp_path / "tp")])
    tp_loss = first_loss(capsys.readouterr().out)
    # same images, same flips (key folded by data index in both steps),
    # same math modulo the classifier psum's f32 reassociation
    assert tp_loss == pytest.approx(dp_loss, rel=1e-3)

    # the channel-sharded TrainState checkpointed; --tp resume restores it
    last = sorted((tmp_path / "tp" / "ckpt").rglob("step_*"))[-1]
    main(args + ["--tp", "--root_dir", str(tmp_path / "tp"),
                 "--max_epochs", "2", "--ckpt", str(last)])
    out = capsys.readouterr().out
    m = re.search(r"resumed full train state at step (\d+)", out)
    assert m and int(m.group(1)) >= 1, out


def test_model_arg_passthrough():
    """--model_arg KEY=VALUE reaches the registry factory (the
    reference's --Wbits/--Abit_inter knobs, /root/reference/main.py:44-45)
    and may override the width flags."""
    from scale_imagenet_tpu.main import _parse_model_args, build, parse_args

    assert _parse_model_args(["wbit=4", "lr=0.5", "flag=true", "s=abc"]) == {
        "wbit": 4, "lr": 0.5, "flag": True, "s": "abc"}
    # list-valued knobs (the reference's --groups '1,None,4,None',
    # /root/reference/main.py:51) arrive as tuples with None entries
    assert _parse_model_args(["groups=1,None,4,None", "ks=3,2"]) == {
        "groups": (1, None, 4, None), "ks": (3, 2)}
    cfg = parse_args(["--model", "resnet18", "--model_arg", "wbit=2",
                      "--model_arg", "abit=3"])
    model = build(cfg)
    assert model.config.wbit == 2 and model.config.abit == 3
    # overriding a width flag through --model_arg must not collide with
    # the explicit kwarg
    cfg = parse_args(["--model_arg", "nfilter=4", "--tfilter", "4",
                      "--layers", "0"])
    assert build(cfg).config.nfilter == 4
    with pytest.raises(SystemExit):
        _parse_model_args(["noequals"])
    # a list-valued --model_arg reaches a real config and runs: the
    # TT_general head-disable semantics (groups[1] is None -> heads 1+3)
    import jax
    import jax.numpy as jnp
    cfg = parse_args(["--model", "TT_general", "--model_arg", "nfilter=3",
                      "--model_arg", "tfilter=4",
                      "--model_arg", "groups=1,None,4,None"])
    m = build(cfg)
    assert m.config.groups == (1, None, 4, None)
    assert m.config.nfilter == 3 and m.config.tfilter == 4
    params, state = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, m.config.image_size, m.config.image_size, 3))
    logits, _ = m.apply(params, state, x)
    assert logits.shape == (1, m.config.num_classes)


@pytest.mark.parametrize("model", ["TT_FHE_SMALL", "TT_FHE_XSMALL_vAlexnet"])
def test_cli_fhe_lut_eval(tmp_path, model):
    """--lut serving for the FHE family (32x32), including the VGG-stem
    vAlexnet variant: compiled-table eval through the real CLI matches
    conv-mode eval on the same data."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path / "fake_cifar"
    rng = np.random.default_rng(3)
    for c in range(2):
        d = root / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(5):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.png")

    args = ["--mode", "eval", "--data_dir", str(root),
            "--model", model, "--nfilter", "4", "--tfilter", "4",
            "--eval_batch_size", "4", "--num_workers", "1",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    conv = main(args)
    lut_path = str(tmp_path / "fhe_luts.npz")
    lut1 = main(args + ["--lut", "--lut_path", lut_path])
    assert os.path.exists(lut_path)
    lut2 = main(args + ["--lut", "--lut_path", lut_path])  # load path
    assert lut1 == conv and lut2 == conv


def test_cli_robust_train_flags(tmp_path, capsys):
    """--abstract_eps/--abstract_coeff and --bias_decay/--bias_thresh
    reach the robust train step through the CLI (the reference keeps
    compute_act_stabilizing_loss_abstract and BiasRegularizer one method
    call away on every model, netbin.py:726-738,786-864)."""
    import re

    import numpy as np
    import pytest
    from PIL import Image

    rng = np.random.default_rng(3)
    for c in range(3):
        d = tmp_path / "data" / "train" / f"n{c:08d}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")

    args = ["--mode", "train", "--data_dir", str(tmp_path / "data"),
            "--model", "cifar10lownoise", "--train_batch_size", "4",
            "--max_epochs", "1", "--root_dir", str(tmp_path),
            "--mesh_data", "1", "--log_interval", "1",
            "--abstract_eps", "0.0078", "--abstract_coeff", "0.01",
            "--bias_decay", "0.001", "--bias_thresh", "0.5"]
    capsys.readouterr()
    main(args)
    out = capsys.readouterr().out
    m = re.search(r"loss ([\d.]+)", out)
    assert m and np.isfinite(float(m.group(1))), out

    # all three robustness losses compose in one CLI run
    main(args + ["--stability_eps", "0.0078",
                 "--root_dir", str(tmp_path / "all3")])
    out = capsys.readouterr().out
    m = re.search(r"loss ([\d.]+)", out)
    assert m and np.isfinite(float(m.group(1))), out

    # the abstract loss refuses models without an interval forward
    with pytest.raises(ValueError, match="interval"):
        main(["--mode", "train", "--data_dir", str(tmp_path / "data"),
              "--model", "ttnet_imagenet_xsmall", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0", "--train_batch_size", "4",
              "--max_epochs", "1", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--abstract_eps", "0.0078"])


def test_cli_fold_bn_eval(fake_imagenet, tmp_path):
    """--fold_bn serves the BN-folded weights through the unchanged
    apply fn (the reference's bn_fuse.py workflow): metrics equal the
    unfused run; misuse raises with the right flag named."""
    args = ["--mode", "eval", "--data_dir", fake_imagenet,
            "--model", "ttnet_imagenet_xsmall",
            "--nfilter", "4", "--tfilter", "4", "--layers", "0",
            "--eval_batch_size", "4", "--num_workers", "2",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    base = main(args)
    folded = main(args + ["--fold_bn"])
    assert folded == pytest.approx(base, abs=1e-3)

    # composes with channel-group TP: the folded stem/classifier biases
    # ride the sharded tree (stem bias model-sharded, lin1 bias
    # replicated + added once post-psum)
    tp_args = ["--mode", "eval", "--data_dir", fake_imagenet,
               "--model", "ttnet_imagenet_small",
               "--nfilter", "8", "--tfilter", "4", "--layers", "0",
               "--eval_batch_size", "4", "--num_workers", "2",
               "--root_dir", str(tmp_path / "tp"),
               "--mesh_data", "2", "--mesh_model", "2"]
    dp = main(tp_args + ["--fold_bn"])
    tp = main(tp_args + ["--fold_bn", "--tp"])
    assert tp == pytest.approx(dp, abs=1e-3)

    with pytest.raises(ValueError, match="drop one"):
        main(args + ["--fold_bn", "--lut"])
    with pytest.raises(ValueError, match="conv/BN pairing"):
        main(["--mode", "eval", "--data_dir", fake_imagenet,
              "--model", "TT_FHE_SMALL", "--eval_batch_size", "4",
              "--root_dir", str(tmp_path), "--mesh_data", "1",
              "--fold_bn"])
    with pytest.raises(ValueError, match="--fold_bn"):
        main(["--mode", "train", "--data_dir", fake_imagenet,
              "--model", "ttnet_imagenet_xsmall", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0", "--train_batch_size",
              "4", "--max_epochs", "1", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--fold_bn"])


def test_cli_gate_eval(tmp_path):
    """--gates serves the compiled boolean circuit through the real CLI:
    gate-mode eval (DNF and CNF encodings) matches conv-mode eval on the
    same data, and the mode-mix guards reject nonsense combinations."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path / "fake_cifar"
    rng = np.random.default_rng(5)
    for c in range(2):
        d = root / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(5):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.png")

    args = ["--mode", "eval", "--data_dir", str(root),
            "--model", "TT_FHE_SMALL", "--nfilter", "4", "--tfilter", "4",
            "--eval_batch_size", "4", "--num_workers", "1",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    conv = main(args)
    # device path (default when the cube tensors fit — round 5)
    assert main(args + ["--gates", "dnf"]) == conv
    assert main(args + ["--gates", "cnf"]) == conv
    # device path dp-sharded over the mesh (shard_map batch slices)
    assert main(args + ["--gates", "dnf", "--mesh_data", "2"]) == conv
    # forced host path (native word-parallel evaluator) — same metrics
    from scale_imagenet_tpu.config import performance

    saved = performance.gates_device_budget
    performance.gates_device_budget = 0
    try:
        assert main(args + ["--gates", "dnf"]) == conv
    finally:
        performance.gates_device_budget = saved

    with pytest.raises(ValueError, match="pick one"):
        main(args + ["--gates", "dnf", "--lut"])
    with pytest.raises(ValueError, match="HOST circuit"):
        main(args + ["--gates", "dnf", "--tp"])
    with pytest.raises(ValueError, match="boolean covers"):
        main(args + ["--gates", "dnf", "--bf16"])
    with pytest.raises(ValueError, match="unfolded"):
        main(args + ["--gates", "dnf", "--fold_bn"])
    with pytest.raises(ValueError, match="ttnet_imagenet and TT_FHE"):
        main(["--mode", "eval", "--data_dir", str(root),
              "--model", "resnet18", "--eval_batch_size", "4",
              "--root_dir", str(tmp_path), "--mesh_data", "1",
              "--gates", "dnf"])
    with pytest.raises(ValueError, match="serving mode"):
        main(["--mode", "train", "--data_dir", str(root),
              "--model", "TT_FHE_SMALL", "--nfilter", "4", "--tfilter",
              "4", "--train_batch_size", "4", "--max_epochs", "1",
              "--root_dir", str(tmp_path), "--mesh_data", "1",
              "--gates", "dnf"])
    with pytest.raises(ValueError, match="writes the artifacts"):
        main(["--mode", "compile", "--model", "TT_FHE_SMALL",
              "--nfilter", "4", "--tfilter", "4",
              "--compile_out", str(tmp_path / "tt"),
              "--root_dir", str(tmp_path), "--gates", "dnf"])


def test_cli_list_models():
    """--list_models prints the registry (reference names verbatim)."""
    from scale_imagenet_tpu.main import main

    names = main(["--list_models"])
    assert "TT_vf_19lv3_imgnet_small" in names
    assert "TT_FHE_SMALL" in names and "resnet18" in names
    assert len(names) >= 65


def test_cli_compile_cache(fake_imagenet, tmp_path):
    """--compile_cache persists XLA programs: the dir populates on the
    first run and a second run reproduces the metrics from cache."""
    from scale_imagenet_tpu.main import main

    cache = str(tmp_path / "xla_cache")
    base = ["--mode", "eval", "--data_dir", fake_imagenet,
            "--nfilter", "4", "--tfilter", "4", "--layers", "0",
            "--eval_batch_size", "4", "--mesh_data", "1",
            "--compile_cache", cache, "--root_dir", str(tmp_path)]
    first = main(base)
    assert os.listdir(cache), "compilation cache did not populate"
    assert main(base) == first
