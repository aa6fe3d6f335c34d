#!/usr/bin/env python
"""Entry-point shim (reference invocation: python eval_disentanglement.py ...)."""

from infodiffusion_tpu.eval_disentanglement import main

if __name__ == "__main__":
    main()
