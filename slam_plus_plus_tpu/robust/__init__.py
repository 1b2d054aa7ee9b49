from slam_plus_plus_tpu.robust.losses import (
    LOSSES,
    cauchy_weight,
    fair_weight,
    hampel_weight,
    huber_weight,
    logistic_weight,
    tukey_weight,
    welsch_weight,
)

__all__ = [
    "LOSSES", "huber_weight", "cauchy_weight", "tukey_weight", "hampel_weight",
    "logistic_weight", "fair_weight", "welsch_weight",
]
