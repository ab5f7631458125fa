"""Unified command dispatcher: ``python -m crosstalk_tpu <command> [...]``.

One entry point over the reference-compatible CLIs (which also remain
available as their original script names — reference train_model.py,
test-cross-talk-model.py, analyse_training_results.py — and as
``python -m crosstalk_tpu.cli.<module>``):

    python -m crosstalk_tpu train -m Mixed -s Source -b 256 -l 5e-4
    python -m crosstalk_tpu evaluate -p model.pth -m Mixed -s Source
    python -m crosstalk_tpu predict -m Mixed -s Source -p model.pth --unmix
    python -m crosstalk_tpu serve -p model.pth --port 8000
    python -m crosstalk_tpu remote-eval -m Mixed -s Source --url http://h:8000
    python -m crosstalk_tpu analyse -d runs/
    python -m crosstalk_tpu export -p model.pth --out model.ctkx
"""

from __future__ import annotations

import sys


def _load(command: str):
    if command == "train":
        from crosstalk_tpu.cli.train import main
    elif command in ("evaluate", "eval", "test"):
        from crosstalk_tpu.cli.evaluate import main
    elif command == "predict":
        from crosstalk_tpu.cli.predict import main
    elif command == "serve":
        from crosstalk_tpu.cli.serve import main
    elif command in ("remote-eval", "remote_eval"):
        from crosstalk_tpu.cli.remote_eval import main
    elif command in ("analyse", "analyze"):
        from crosstalk_tpu.cli.analyse import main
    elif command == "doctor":
        from crosstalk_tpu.cli.doctor import main
    elif command == "export":
        try:
            from tools.export_model import main  # repo checkout
        except ImportError as e:
            if e.name not in ("tools", "tools.export_model"):
                raise  # a real missing dependency inside the module, not
                # "the tools/ tree is absent from this install"

            def main(argv=None):
                print("Error: the export command needs the repo checkout "
                      "(tools/export_model.py is not part of the installed "
                      "package); run tools/export_model.py directly.")
                return 1
    else:
        return None
    return main


_USAGE = """usage: python -m crosstalk_tpu <command> [args...]

commands:
  train        train a model (reference train_model.py surface)
  evaluate     score a labeled directory + classical metrics (test-cross-talk-model.py)
  predict      score unlabeled pairs; --unmix writes corrected tiles
  serve        HTTP serving with dynamic batching
  remote-eval  reference eval workflow against a running server
  analyse      consolidate training_run_* sweeps (analyse_training_results.py)
  export       AOT StableHLO deployment artifact
  doctor       verify this machine's deployment health (devices, decoder,
               compile cache, forward smoke test, checkpoint/server probes)

`python -m crosstalk_tpu <command> --help` shows each command's flags."""


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_USAGE)
        return 0 if argv else 1
    command, rest = argv[0], argv[1:]
    entry = _load(command)
    if entry is None:
        print(f"Error: unknown command '{command}'.\n\n{_USAGE}")
        return 1
    return entry(rest)


if __name__ == "__main__":
    sys.exit(main())
