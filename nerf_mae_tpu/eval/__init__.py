from nerf_mae_tpu.eval.detection import (
    proposal_recall,
    proposal_precision,
    proposal_average_precision,
    detection_eval_summary,
)

__all__ = [
    "proposal_recall",
    "proposal_precision",
    "proposal_average_precision",
    "detection_eval_summary",
]
