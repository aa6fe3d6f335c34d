#!/usr/bin/env python
"""Entry-point shim with the reference's invocation contract:
``python run.py --model diff --mode train ...`` (reference: run.py)."""

from infodiffusion_tpu.cli import main

if __name__ == "__main__":
    main()
