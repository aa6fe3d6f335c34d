#!/bin/bash
# FID/KID of a generated folder (reference: calc_fid.sh)
python calc_fid.py celeba ./imgs/celeba_256d_0.1mmd/eval-fid-latent
