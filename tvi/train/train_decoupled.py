"""Decoupled trainer CLI — src/train_decouples.py parity: motion encoder,
zeros-instead-of-mask-token conditioning, attention-monotonicity loss and
temporal attention bias mask.  Thin wrapper over train_interp with
``--decoupled`` forced on (the two reference scripts share ~90% of their
loop; SURVEY §2.3)."""

from __future__ import annotations

import sys

from tvi.train.train_interp import main as _main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--decoupled" not in argv:
        argv.append("--decoupled")
    _main(argv)


if __name__ == "__main__":
    main()
