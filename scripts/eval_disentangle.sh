#!/bin/bash
python eval_disentanglement.py --model diff --mode save_latent --mmd_weight 0.1 --a_dim 256 --epochs 50 --dataset celeba --deterministic --prior regular --r_seed 64
