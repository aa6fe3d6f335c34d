#!/bin/bash
python run.py --model diff --mode interpolate --mmd_weight 0.1 --a_dim 32 --epochs 50 --dataset celeba --deterministic --prior regular --r_seed 64 --img_id 0
