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

def test_dispatcher_export_import_error_discrimination(capsys, monkeypatch):
    """The export fallback message must fire only when the tools/ tree
    itself is absent (installed-package case); a genuine missing dependency
    raised INSIDE tools/export_model.py propagates (round-3 advice)."""
    import sys

    # tools tree absent -> friendly not-in-checkout message, rc 1
    monkeypatch.delitem(sys.modules, "tools.export_model", raising=False)
    monkeypatch.setitem(sys.modules, "tools.export_model", None)
    assert dispatch(["export", "--out", "x.ctkx"]) == 1
    assert "not part of the installed package" in capsys.readouterr().out

    # a transitive dependency missing -> re-raise, no misleading message
    class _Raiser:
        def find_spec(self, name, path=None, target=None):
            if name == "tools.export_model":
                raise ImportError("No module named 'somedep'", name="somedep")
            return None

    monkeypatch.delitem(sys.modules, "tools.export_model", raising=False)
    monkeypatch.setattr(sys, "meta_path", [_Raiser()] + sys.meta_path)
    with pytest.raises(ImportError, match="somedep"):
        dispatch(["export", "--out", "x.ctkx"])
