"""Root conftest: make the in-tree package importable regardless of cwd."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
