from .score import (
    round_half_away,
    rounded_score_col,
    severity_col,
    weighted_score,
    weighted_score_col,
)

__all__ = [
    "round_half_away",
    "rounded_score_col",
    "severity_col",
    "weighted_score",
    "weighted_score_col",
]
