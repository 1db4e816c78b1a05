"""ATE/RPE evaluation CLI — layout-compatible wrapper mirroring reference
evaluation/evaluate_ate_freiburg.py (implementation lives in
robust_pose_tpu/utils/evaluate.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from robust_pose_tpu.utils.evaluate import evaluate as eval  # noqa: F401,E402
from robust_pose_tpu.utils.evaluate import get_traj_length, main  # noqa: F401,E402

if __name__ == "__main__":
    main()
