#!/usr/bin/env python3
"""Entry point: python run.py {slam,mesh,eval_odom,eval_recon,crop_recon,
generate_dummy_cfg} ...  (see splatloam_tpu/cli.py)."""
from splatloam_tpu.cli import main

if __name__ == "__main__":
    main()
