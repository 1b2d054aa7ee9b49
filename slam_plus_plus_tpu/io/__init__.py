from slam_plus_plus_tpu.io.parser import parse_g2o, peek_dataset

__all__ = ["parse_g2o", "peek_dataset"]
