"""Plain-python test runner mirroring reference tests/unit_test_all.py —
lets the suite run without pytest (python tests/unit_test_all.py)."""
import os
import subprocess
import sys

if __name__ == "__main__":
    sys.exit(subprocess.call(
        [sys.executable, "-m", "pytest",
         os.path.dirname(os.path.abspath(__file__)), "-q"]))
