"""``python -m torchani_tpu`` — dispatches to the CLI (see cli.py)."""

from torchani_tpu.cli import main

if __name__ == "__main__":
    main()
