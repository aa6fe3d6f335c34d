#!/usr/bin/env python
"""FID/KID computation (reference: calc_fid.py — cleanfid compute_fid /
compute_kid with dataset_res=64, num_gen=10000)."""

import sys

from infodiffusion_tpu.cache import force_cpu_if_requested
from infodiffusion_tpu.metrics.fid import compute_fid, compute_kid

if __name__ == "__main__":
    force_cpu_if_requested()
    dataset_name = sys.argv[1]
    folder_1 = sys.argv[2]
    kwargs = dict(dataset_name=dataset_name, dataset_res=64, num_gen=10000)
    fid_score = compute_fid(folder_1, **kwargs)
    print(f"fid: score: {fid_score}")
    kid_score = compute_kid(folder_1, **kwargs)
    print(f"kid: score: {kid_score}")
