from slam_plus_plus_tpu.ops import planar

__all__ = ["planar"]
