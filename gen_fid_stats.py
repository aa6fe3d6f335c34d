#!/usr/bin/env python
"""FID stats generation (reference: gen_fid_stats.py — cleanfid
make_custom_stats over the save_original_img dump)."""

import sys

from infodiffusion_tpu.cache import force_cpu_if_requested
from infodiffusion_tpu.metrics.fid import make_custom_stats

if __name__ == "__main__":
    force_cpu_if_requested()
    custom_name = sys.argv[1]
    dataset_path = sys.argv[2]
    print(f"Generating fid stats for dataset {custom_name} located at {dataset_path}")
    path = make_custom_stats(custom_name, dataset_path)
    print(f"Saved stats to {path}")
