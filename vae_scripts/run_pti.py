#!/usr/bin/env python
"""Thin wrapper — see pti_ldm_vae_tpu/cli/run_pti.py."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from pti_ldm_vae_tpu.cli.run_pti import main

if __name__ == "__main__":
    main()
