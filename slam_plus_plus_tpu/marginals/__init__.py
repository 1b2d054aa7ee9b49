from slam_plus_plus_tpu.marginals.covariance import Marginals, MarginalsResult

__all__ = ["Marginals", "MarginalsResult"]
