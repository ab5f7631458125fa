"""Public API surface: the top-level package re-exports the library's
working vocabulary so a migrating user can do ``import crosstalk_tpu`` and
find everything (reference: a user of djpbarry/Torch-Unet imports nothing —
its API is three scripts; ours is additionally a library)."""

import importlib

import crosstalk_tpu as ct


def test_top_level_api_resolves():
    for name in ct.__all__:
        if name == "__version__":
            continue
        obj = getattr(ct, name)
        assert obj is not None, name


def test_top_level_api_matches_submodule_objects():
    # Lazy resolution must hand back the SAME object the submodule defines.
    assert ct.PairIndex is importlib.import_module("crosstalk_tpu.data").PairIndex
    assert ct.build_model is importlib.import_module("crosstalk_tpu.models").build_model
    assert ct.train_model is importlib.import_module("crosstalk_tpu.train").train_model
    assert (
        ct.make_fast_forward
        is importlib.import_module("crosstalk_tpu.eval").make_fast_forward
    )
    assert ct.load_pth is importlib.import_module("crosstalk_tpu.io").load_pth


def test_unknown_attribute_raises():
    try:
        ct.definitely_not_a_symbol
    except AttributeError as e:
        assert "definitely_not_a_symbol" in str(e)
    else:
        raise AssertionError("expected AttributeError")


def test_dir_lists_public_names():
    names = dir(ct)
    for expected in ("ModelConfig", "TileStore", "evaluate_and_save", "save_pth"):
        assert expected in names


def test_subpackage_all_exports_resolve():
    for pkg in ("data", "models", "train", "eval", "io", "serve", "ops", "parallel"):
        mod = importlib.import_module(f"crosstalk_tpu.{pkg}")
        for name in getattr(mod, "__all__", []):
            assert getattr(mod, name) is not None, f"{pkg}.{name}"
