"""`python -m splatloam_tpu` entry point (used by the elastic-recovery
supervisor to respawn the slam command, ref run.py:34).
"""
from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
