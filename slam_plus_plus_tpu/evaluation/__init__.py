from slam_plus_plus_tpu.evaluation.error_eval import (
    ate_rmse, kabsch_align, rpe_errors, evaluate_trajectory)

__all__ = ["ate_rmse", "kabsch_align", "rpe_errors", "evaluate_trajectory"]
