"""`python -m clibd_tpu.cli` entry (the packaged `clibd` console script)."""
import sys

from . import main

if __name__ == "__main__":
    sys.exit(main())
