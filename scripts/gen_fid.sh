#!/bin/bash
# real-image stats (reference: gen_fid.sh)
python run.py --model diff --mode save_original_img --a_dim 256 --dataset celeba --prior regular --batch_size 1
python gen_fid_stats.py celeba ./celeba_imgs
