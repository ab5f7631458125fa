"""`python -m crosstalk_tpu <command>` dispatcher tests."""

import numpy as np
import pytest

from crosstalk_tpu.__main__ import main as dispatch


def test_dispatcher_usage_and_unknown(capsys):
    assert dispatch([]) == 1
    assert "usage: python -m crosstalk_tpu" in capsys.readouterr().out
    assert dispatch(["--help"]) == 0
    capsys.readouterr()
    assert dispatch(["frobnicate"]) == 1
    assert "unknown command 'frobnicate'" in capsys.readouterr().out


def test_dispatcher_routes_to_real_clis(capsys):
    # Each command's argparse --help proves the right module was loaded
    # (SystemExit 0 from argparse).
    for command, marker in (
        ("train", "--learning_rate"),
        ("evaluate", "--model_path"),
        ("predict", "--unmix"),
        ("serve", "--batch_buckets"),
        ("remote-eval", "--url"),
        ("analyse", "--base_directory"),
        ("export", "--out"),
        ("doctor", "--image_size"),
    ):
        with pytest.raises(SystemExit) as exc:
            dispatch([command, "--help"])
        assert exc.value.code == 0, command
        assert marker in capsys.readouterr().out, command


def test_dispatcher_runs_predict_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")

    from crosstalk_tpu.data.tiff import write_tile
    from tests.torch_ref import TorchSingle, burn_in_batch_stats

    mixed = tmp_path / "M"
    source = tmp_path / "S"
    mixed.mkdir()
    source.mkdir()
    rng = np.random.default_rng(2)
    write_tile(str(mixed / "a.tif"), rng.random((32, 32)))
    write_tile(str(source / "a.tif"), rng.random((32, 32)))
    torch.manual_seed(3)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=32)
    burn_in_batch_stats(tmodel, 32, steps=2)
    ckpt = str(tmp_path / "m.pth")
    torch.save(tmodel.state_dict(), ckpt)

    rc = dispatch(["predict", "-m", str(mixed), "-s", str(source),
                   "-p", ckpt, "--output_base", str(tmp_path / "out")])
    assert rc == 0


def test_doctor_end_to_end(tmp_path, capsys):
    torch = pytest.importorskip("torch")

    from tests.torch_ref import TorchSingle, burn_in_batch_stats

    torch.manual_seed(5)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=32)
    burn_in_batch_stats(tmodel, 32, steps=2)
    ckpt = str(tmp_path / "m.pth")
    torch.save(tmodel.state_dict(), ckpt)

    rc = dispatch(["doctor", "--image_size", "16", "-p", ckpt])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "jitted forward" in out and "checkpoint" in out
    assert "All checks passed" in out
    # size detection is structure-derived: the 8x3 model must be reported
    assert "initial_filters=8" in out and "num_conv_blocks=3" in out

    # a corrupt checkpoint is a FAIL (clear report, nonzero exit)
    bad = tmp_path / "bad.pth"
    bad.write_bytes(b"not a checkpoint")
    rc = dispatch(["doctor", "--image_size", "16", "-p", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out and "check(s) FAILED" in out

    # an unreachable server probe is a FAIL, not a traceback
    rc = dispatch(["doctor", "--image_size", "16",
                   "--url", "http://127.0.0.1:1", "--timeout", "0.2"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "serving endpoint" in out and "FAIL" in out

    # flag validation
    assert dispatch(["doctor", "--image_size", "0"]) == 1
    assert "--image_size" in capsys.readouterr().out
